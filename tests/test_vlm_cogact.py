import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.cogact import (
    CogActConfig,
    cogact_inference_action,
    cogact_loss,
    denorm_actions,
    init_cogact,
)
from dexbotic_tpu.models.losses import causal_lm_loss
from dexbotic_tpu.models.vlm import (
    VLMConfig,
    encode_images,
    gather_last_hidden,
    init_vlm,
    last_valid_index,
    splice_image_embeds,
    vlm_forward,
)
from dexbotic_tpu.nn.transformer import TransformerConfig
from dexbotic_tpu.nn.vit import ViTConfig

LLM = TransformerConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=8, intermediate_size=64, attn_impl="xla",
)
VIT = ViTConfig(
    image_size=28, patch_size=14, hidden_size=24, num_layers=2, num_heads=4,
    intermediate_size=48, select_layer=None,
)
VLM = VLMConfig(llm=LLM, vit=VIT, projector_type="mlp2x_gelu")


def _ids_with_images(B, n_img, text_len):
    nt = VLM.num_image_tokens
    ids = np.random.RandomState(0).randint(1, 100, (B, n_img * nt + text_len))
    ids[:, : n_img * nt] = IMAGE_TOKEN_INDEX
    return jnp.asarray(ids)


def test_num_image_tokens():
    assert VLM.num_image_tokens == 4


def test_splice_places_features():
    p = init_vlm(jax.random.PRNGKey(0), VLM)
    B = 2
    ids = _ids_with_images(B, 1, 5)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (B, 28, 28, 3))
    feats = encode_images(p, VLM, imgs)
    assert feats.shape == (B, 4, 32)
    emb = splice_image_embeds(p, VLM, ids, feats)
    np.testing.assert_allclose(np.asarray(emb[:, :4]), np.asarray(feats), rtol=1e-5)
    # text positions use embedding table
    np.testing.assert_allclose(
        np.asarray(emb[0, 4]),
        np.asarray(p["llm"]["embed"]["embedding"][int(ids[0, 4])]),
        rtol=1e-5,
    )


def test_vlm_forward_shapes():
    p = init_vlm(jax.random.PRNGKey(0), VLM)
    ids = _ids_with_images(2, 1, 5)
    valid = jnp.ones(ids.shape, jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 28, 28, 3))
    hidden, _ = vlm_forward(p, VLM, ids, valid, images=imgs)
    assert hidden.shape == (2, 9, 32)
    assert np.isfinite(np.asarray(hidden)).all()


def test_last_valid_index_right_and_left_pad():
    valid = jnp.array([[1, 1, 1, 0, 0], [0, 0, 1, 1, 1]])
    np.testing.assert_array_equal(np.asarray(last_valid_index(valid)), [2, 4])
    h = jnp.arange(10, dtype=jnp.float32).reshape(2, 5, 1)
    np.testing.assert_array_equal(np.asarray(gather_last_hidden(h, valid))[:, 0], [2.0, 9.0])


COG = CogActConfig(vlm=VLM, action_model_type="DiT-S", action_dim=7, chunk_size=4)


def _batch(B=2):
    ids = _ids_with_images(B, 1, 5)
    return {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jax.random.normal(jax.random.PRNGKey(1), (B, 1, 28, 28, 3)),
        "actions": jax.random.normal(jax.random.PRNGKey(2), (B, 4, 7)),
    }


def test_cogact_loss_finite_and_grad():
    p = init_cogact(jax.random.PRNGKey(0), COG)
    # jitted value_and_grad: loss asserts + grad-flow in one compile
    (loss, metrics), g = jax.jit(jax.value_and_grad(
        lambda pp: cogact_loss(pp, COG, _batch(), jax.random.PRNGKey(3)),
        has_aux=True))(p)
    assert np.isfinite(float(loss))
    assert "action_loss" in metrics
    gnorm = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_cogact_inference_shapes_and_determinism():
    p = init_cogact(jax.random.PRNGKey(0), COG)
    b = _batch()
    out = cogact_inference_action(
        p, COG, b["input_ids"], b["attention_mask"], b["images"], jax.random.PRNGKey(5)
    )
    assert out.shape == (2, 4, 7)
    out2 = cogact_inference_action(
        p, COG, b["input_ids"], b["attention_mask"], b["images"], jax.random.PRNGKey(5)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)
    # no-CFG path
    out3 = cogact_inference_action(
        p, COG, b["input_ids"], b["attention_mask"], b["images"], jax.random.PRNGKey(5),
        cfg_scale=1.0,
    )
    assert out3.shape == (2, 4, 7)


def test_denorm_actions():
    a = jnp.array([[-1.0, 0.0, 1.0, 2.0]])
    out = denorm_actions(a, low=[0, 0, 0, 0], high=[10, 10, 10, 10])
    np.testing.assert_allclose(np.asarray(out[0]), [0, 5, 10, 10], rtol=1e-6)


def test_causal_lm_loss_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[1, 2, IGNORE_INDEX, 3]])
    loss = causal_lm_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(8.0), rtol=1e-5)
