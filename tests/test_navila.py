import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.navila import (
    FrameHistoryBuffer,
    NaVILAConfig,
    init_navila,
    navila_forward_packed,
    navila_loss,
    pack_batch,
)
from dexbotic_tpu.models.presets import LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig
from dexbotic_tpu.nn.transformer import Stream, embed_tokens, mot_forward

CFG = NaVILAConfig(vlm=VLMConfig(llm=LLM_TEST, vit=VIT_TEST), num_video_frames=4)


def test_navila_loss_multiframe():
    params = init_navila(jax.random.PRNGKey(0), CFG)
    B, frames = 2, 4
    nt = CFG.vlm.num_image_tokens * frames
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 400, (B, nt + 8))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, : nt + 4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(rs.randn(B, frames, 28, 28, 3), jnp.float32),
        "labels": jnp.asarray(labels),
    }
    loss, _ = navila_loss(params, CFG, batch)
    assert np.isfinite(float(loss))
    # soft CE over a numeric token set
    soft = jnp.asarray([10, 11, 12, 13, 14])
    loss2, _ = navila_loss(params, CFG, batch, soft_tokens=soft)
    assert np.isfinite(float(loss2))


def test_pack_batch_and_segment_isolation():
    rs = np.random.RandomState(0)
    B, L = 4, 10
    lens = [10, 6, 4, 3]
    ids = np.zeros((B, L), np.int64)
    valid = np.zeros((B, L), np.int64)
    for i, l in enumerate(lens):
        ids[i, :l] = rs.randint(1, 400, l)
        valid[i, :l] = 1
    labels = ids.copy()
    packed = pack_batch(ids, labels, valid, num_rows=3, max_len=12, pad_token_id=0)
    # total valid preserved
    assert packed["attention_mask"].sum() == sum(lens)
    # segments don't overlap, positions restart
    seg = packed["segments"]
    pos = packed["positions"]
    for r in range(3):
        for s in np.unique(seg[r]):
            if s < 0:
                continue
            sel = seg[r] == s
            np.testing.assert_array_equal(pos[r][sel], np.arange(sel.sum()))

    # packed forward == per-sequence forward
    params = init_navila(jax.random.PRNGKey(0), CFG)
    emb_packed = embed_tokens(params["vlm"]["llm"], CFG.vlm.llm, jnp.asarray(packed["input_ids"]))
    out_packed = navila_forward_packed(params, CFG, {
        "input_ids": jnp.asarray(packed["input_ids"]),
        "attention_mask": jnp.asarray(packed["attention_mask"]),
        "positions": jnp.asarray(packed["positions"]),
        "segments": jnp.asarray(packed["segments"]),
    }, images_embeds=emb_packed)

    # sequence 1 (len 6): find where it landed
    target = ids[1, :6]
    found = False
    for r in range(3):
        for s0 in range(12 - 6 + 1):
            if (packed["input_ids"][r, s0 : s0 + 6] == target).all() and (
                packed["segments"][r, s0 : s0 + 6] == packed["segments"][r, s0]
            ).all() and packed["segments"][r, s0] >= 0:
                emb1 = embed_tokens(params["vlm"]["llm"], CFG.vlm.llm, jnp.asarray(target)[None])
                v1 = jnp.ones((1, 6), jnp.int32)
                outs, _ = mot_forward(
                    [Stream(CFG.vlm.llm, params["vlm"]["llm"], emb1)],
                    positions=jnp.arange(6)[None], q_grp=jnp.arange(1, 7)[None],
                    q_valid=v1,
                )
                np.testing.assert_allclose(
                    np.asarray(out_packed[r, s0 : s0 + 6]), np.asarray(outs[0][0]),
                    rtol=2e-4, atol=1e-5,
                )
                found = True
                break
        if found:
            break
    assert found


def test_frame_history_buffer():
    buf = FrameHistoryBuffer(num_frames=4)
    for i in range(3):
        frames = buf.add(i)
    assert frames == [0, 1, 2, 2]  # padded with last
    for i in range(3, 10):
        frames = buf.add(i)
    assert len(frames) == 4 and frames[0] == 0 and frames[-1] == 9
