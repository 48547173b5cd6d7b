import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.nn.projector import apply_projector, init_projector
from dexbotic_tpu.nn.vit import ViTConfig, init_vit, patchify, vit_forward

TINY = ViTConfig(
    image_size=28, patch_size=14, hidden_size=32, num_layers=3, num_heads=4,
    intermediate_size=64, select_layer=None,
)


def test_patchify_roundtrip_order():
    img = jnp.arange(2 * 28 * 28 * 3, dtype=jnp.float32).reshape(2, 28, 28, 3)
    p = patchify(img, 14)
    assert p.shape == (2, 4, 14 * 14 * 3)
    # first patch = top-left block in (row, col, chan) order
    np.testing.assert_array_equal(
        np.asarray(p[0, 0]).reshape(14, 14, 3), np.asarray(img[0, :14, :14])
    )
    np.testing.assert_array_equal(
        np.asarray(p[0, 1]).reshape(14, 14, 3), np.asarray(img[0, :14, 14:])
    )


def test_vit_siglip_style():
    params = init_vit(jax.random.PRNGKey(0), TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = vit_forward(params, TINY, imgs)
    assert out.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_clip_style_select_layer():
    cfg = dataclasses.replace(
        TINY, use_cls=True, pre_ln=True, select_layer=-2, act="quick_gelu"
    )
    params = init_vit(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = vit_forward(params, cfg, imgs)
    # CLS dropped
    assert out.shape == (2, 4, 32)

    # select_layer=-2 on a 3-layer tower == select_layer=-1 on the same tower
    # truncated to 2 layers (both run exactly 2 layers, no post-LN)
    cfg2 = dataclasses.replace(cfg, num_layers=2, select_layer=-1)
    params2 = {**params, "layers": jax.tree.map(lambda p: p[:2], params["layers"])}
    out_trunc = vit_forward(params2, cfg2, imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_trunc), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ptype,in_tokens,expect_tokens", [
    ("linear", 16, 16),
    ("mlp2x_gelu", 16, 16),
    ("mlp_downsample", 16, 4),
    ("mlp_downsample", 9, 4),  # odd grid zero-padded
])
def test_projectors(ptype, in_tokens, expect_tokens):
    mm_h, h = 24, 40
    p = init_projector(jax.random.PRNGKey(0), ptype, mm_h, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, in_tokens, mm_h))
    out = apply_projector(p, x, ptype)
    assert out.shape == (2, expect_tokens, h)
    assert np.isfinite(np.asarray(out)).all()


def test_linear_nx_projector():
    p = init_projector(jax.random.PRNGKey(0), "linear2x", 24, 40)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 48))
    out = apply_projector(p, x, "linear2x")
    assert out.shape == (2, 8, 40)


def test_pe_vit_forward_and_pooling():
    from dexbotic_tpu.nn.pe_vit import PEViTConfig, init_pe_vit, pe_vit_forward

    cfg = PEViTConfig(image_size=28, patch_size=14, hidden_size=32, num_layers=2,
                      num_heads=4, intermediate_size=64)
    p = init_pe_vit(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = pe_vit_forward(p, cfg, imgs)
    assert out.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(out)).all()

    cfg2 = PEViTConfig(image_size=28, patch_size=14, hidden_size=32, num_layers=2,
                       num_heads=4, intermediate_size=64, pool_tokens=2)
    p2 = init_pe_vit(jax.random.PRNGKey(0), cfg2)
    out2 = pe_vit_forward(p2, cfg2, imgs)
    assert out2.shape == (2, 2, 32)

    # 2D RoPE: translation changes outputs (position-sensitive) but grid
    # structure is respected — just check determinism + finiteness here
    out3 = pe_vit_forward(p, cfg, imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3), rtol=1e-6)
