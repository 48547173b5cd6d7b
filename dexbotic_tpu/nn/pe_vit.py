"""Perception Encoder (PE) vision tower: 2D-RoPE ViT with LayerScale and
attention pooling.

Capability-equivalent of the reference's Meta-PE reimplementation
(/root/reference/dexbotic/model/modules/mm_vision/pe/pe_model.py): 2D rotary
positions over the patch grid (:50-129), LayerScale residual scaling,
AttentionPooling head (:142), and an abs-posemb downsampler variant
(PerceptionEncoderWithDownsample :367-513) exposed here as an optional
learned-query pooling to `num_output_tokens`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.nn import core
from dexbotic_tpu.ops.attention import attention_xla
from dexbotic_tpu.ops.norms import layer_norm
from dexbotic_tpu.nn.vit import patchify


@dataclasses.dataclass(frozen=True)
class PEViTConfig:
    image_size: int = 448
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    ln_eps: float = 1e-5
    layer_scale_init: float = 0.1
    pool_tokens: Optional[int] = None  # None -> return all patch tokens

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_output_tokens(self) -> int:
        return self.pool_tokens or self.grid**2


def _rope2d_tables(cfg: PEViTConfig):
    """Axial 2D RoPE: half the head dims rotate with row index, half with
    column index (pe_model.py:50-129 behavior)."""
    d = cfg.head_dim // 2  # per-axis dims
    g = cfg.grid
    freqs = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
    rows = np.repeat(np.arange(g), g)
    cols = np.tile(np.arange(g), g)

    def table(pos):
        ang = pos[:, None] * freqs[None, :]  # [N, d/2]
        ang = np.concatenate([ang, ang], axis=-1)  # [N, d]
        return np.cos(ang), np.sin(ang)

    rc, rs = table(rows)
    cc, cs = table(cols)
    cos = np.concatenate([rc, cc], axis=-1)  # [N, head_dim]
    sin = np.concatenate([rs, cs], axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def _rotate_half_axial(x, d):
    """rotate-half within each axis block of size d."""
    a, b = x[..., :d], x[..., d:]

    def rot(y):
        h = y.shape[-1] // 2
        return jnp.concatenate([-y[..., h:], y[..., :h]], axis=-1)

    return jnp.concatenate([rot(a), rot(b)], axis=-1)


def _apply_rope2d(x, cos, sin):
    # x [B, N, H, D]; cos/sin [N, D]
    d = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    out = xf * cos[None, :, None, :] + _rotate_half_axial(xf, d) * sin[None, :, None, :]
    return out.astype(x.dtype)


def _pe_layer_init(key, cfg: PEViTConfig, dtype):
    ks = jax.random.split(key, 8)
    h = cfg.hidden_size
    return {
        "ln1": {"w": jnp.ones((h,), jnp.float32), "b": jnp.zeros((h,), jnp.float32)},
        "ln2": {"w": jnp.ones((h,), jnp.float32), "b": jnp.zeros((h,), jnp.float32)},
        "attn": {
            "q": core.linear_init(ks[0], h, h, True, dtype),
            "k": core.linear_init(ks[1], h, h, True, dtype),
            "v": core.linear_init(ks[2], h, h, True, dtype),
            "o": core.linear_init(ks[3], h, h, True, dtype),
        },
        "mlp": {
            "fc1": core.linear_init(ks[4], h, cfg.intermediate_size, True, dtype),
            "fc2": core.linear_init(ks[5], cfg.intermediate_size, h, True, dtype),
        },
        "ls1": jnp.full((h,), cfg.layer_scale_init, jnp.float32),
        "ls2": jnp.full((h,), cfg.layer_scale_init, jnp.float32),
    }


def init_pe_vit(key, cfg: PEViTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    h = cfg.hidden_size
    params = {
        "patch_embed": {
            "w": core.normal_init(0.02)(ks[0], (cfg.patch_size**2 * 3, h), dtype),
            "b": jnp.zeros((h,), dtype),
        },
        "layers": jax.vmap(lambda k: _pe_layer_init(k, cfg, dtype))(
            jax.random.split(ks[1], cfg.num_layers)
        ),
        "post_ln": {"w": jnp.ones((h,), jnp.float32), "b": jnp.zeros((h,), jnp.float32)},
    }
    if cfg.pool_tokens:
        kq, ka = jax.random.split(ks[2])
        params["pool"] = {
            "queries": core.normal_init(h**-0.5)(kq, (cfg.pool_tokens, h), dtype),
            "attn": {
                "q": core.linear_init(ka, h, h, True, dtype),
                "k": core.linear_init(ks[3], h, h, True, dtype),
                "v": core.linear_init(ks[4], h, h, True, dtype),
            },
            "ln": {"w": jnp.ones((h,), jnp.float32), "b": jnp.zeros((h,), jnp.float32)},
        }
    return params


def pe_vit_forward(params, cfg: PEViTConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, num_output_tokens, hidden]."""
    B = images.shape[0]
    x = core.linear(params["patch_embed"], patchify(images, cfg.patch_size))
    N = x.shape[1]
    cos, sin = _rope2d_tables(cfg)
    grp = jnp.zeros((B, N), jnp.int32)
    valid = jnp.ones((B, N), jnp.int32)

    def body(carry, lp):
        h = layer_norm(carry, lp["ln1"]["w"], lp["ln1"]["b"], cfg.ln_eps)
        q = core.linear(lp["attn"]["q"], h).reshape(B, N, cfg.num_heads, cfg.head_dim)
        k = core.linear(lp["attn"]["k"], h).reshape(B, N, cfg.num_heads, cfg.head_dim)
        v = core.linear(lp["attn"]["v"], h).reshape(B, N, cfg.num_heads, cfg.head_dim)
        q = _apply_rope2d(q, cos, sin)
        k = _apply_rope2d(k, cos, sin)
        a = attention_xla(q, k, v, grp, grp, valid)
        a = core.linear(lp["attn"]["o"], a.reshape(B, N, -1))
        x1 = carry + a * lp["ls1"].astype(a.dtype)
        h2 = layer_norm(x1, lp["ln2"]["w"], lp["ln2"]["b"], cfg.ln_eps)
        m = core.linear(lp["mlp"]["fc2"], jax.nn.gelu(core.linear(lp["mlp"]["fc1"], h2)))
        return x1 + m * lp["ls2"].astype(m.dtype), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["post_ln"]["w"], params["post_ln"]["b"], cfg.ln_eps)

    if cfg.pool_tokens:
        p = params["pool"]
        M = cfg.pool_tokens
        q = core.linear(p["attn"]["q"], jnp.broadcast_to(
            p["queries"].astype(x.dtype)[None], (B, M, cfg.hidden_size)
        )).reshape(B, M, cfg.num_heads, cfg.head_dim)
        k = core.linear(p["attn"]["k"], x).reshape(B, N, cfg.num_heads, cfg.head_dim)
        v = core.linear(p["attn"]["v"], x).reshape(B, N, cfg.num_heads, cfg.head_dim)
        pooled = attention_xla(
            q, k, v, jnp.zeros((B, M), jnp.int32), grp, valid
        ).reshape(B, M, -1)
        x = layer_norm(pooled, p["ln"]["w"], p["ln"]["b"], cfg.ln_eps)
    return x
