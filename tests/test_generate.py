import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.discrete_vla import parse_action_text
from dexbotic_tpu.models.generate import generate
from dexbotic_tpu.models.presets import LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig, init_vlm, vlm_forward
from dexbotic_tpu.nn.transformer import lm_logits

VLM = VLMConfig(llm=LLM_TEST, vit=VIT_TEST)


def _prompt(B=2, text=6):
    nt = VLM.num_image_tokens
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 400, (B, nt + text))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    valid = np.ones_like(ids, dtype=bool)
    if B > 1:
        valid[1, -2:] = False
    imgs = rs.randn(B, 1, 28, 28, 3).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(imgs)


def test_greedy_generate_matches_stepwise_full_forward():
    """Each greedy token must equal the argmax of a full re-forward over the
    (unpadded) growing sequence."""
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    ids, valid, imgs = _prompt(B=1)
    T = 4
    toks, _ = generate(
        params, VLM, ids, valid, imgs, max_new_tokens=T,
        eos_token_id=-1, temperature=0.0,
    )
    toks = np.asarray(toks)[0]

    # reference: grow the sequence and full-forward each time
    cur_ids = np.asarray(ids)[0].tolist()
    for t in range(T):
        ii = jnp.asarray(cur_ids)[None]
        vv = jnp.ones(ii.shape, jnp.int32)
        hidden, _ = vlm_forward(params, VLM, ii, vv, images=imgs)
        logits = lm_logits(params["llm"], VLM.llm, hidden[:, -1])
        expect = int(jnp.argmax(logits, -1)[0])
        assert toks[t] == expect, (t, toks[t], expect)
        cur_ids.append(expect)


def test_generate_respects_padding():
    """Row with padded prompt must decode from its true last token."""
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    ids, valid, imgs = _prompt(B=2)
    toks, _ = generate(params, VLM, ids, valid, imgs, max_new_tokens=3,
                       eos_token_id=-1)
    # row 1 trimmed-prompt reference
    ids1 = np.asarray(ids)[1][np.asarray(valid)[1]]
    toks1, _ = generate(
        params, VLM, jnp.asarray(ids1)[None], jnp.ones((1, len(ids1)), jnp.int32),
        imgs[1:2], max_new_tokens=3, eos_token_id=-1,
    )
    np.testing.assert_array_equal(np.asarray(toks)[1], np.asarray(toks1)[0])


def test_eos_stops_and_pads():
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    ids, valid, imgs = _prompt(B=1)
    toks, _ = generate(params, VLM, ids, valid, imgs, max_new_tokens=5,
                       eos_token_id=-1, temperature=0.0)
    greedy_first = int(np.asarray(toks)[0, 0])
    toks2, _ = generate(params, VLM, ids, valid, imgs, max_new_tokens=5,
                        eos_token_id=greedy_first, pad_token_id=0, temperature=0.0)
    t2 = np.asarray(toks2)[0]
    assert t2[0] == greedy_first
    np.testing.assert_array_equal(t2[1:], 0)


def test_parse_action_text():
    out = parse_action_text("action: 0 127 254 10 20 30 40", 7, 255)
    np.testing.assert_allclose(out[:3], [-1.0, 0.0, 1.0], atol=1e-2)
    assert parse_action_text("no numbers here", 7, 255) is None
