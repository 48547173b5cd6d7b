"""Vision transformer encoder, configurable as CLIP-ViT or SigLIP.

One generic encoder covers the reference's tower zoo
(/root/reference/dexbotic/model/modules/mm_vision/):
  * CLIP ViT-L/14 (clip_encoder.py): CLS token, pre-LN, quick_gelu,
    select_layer=-2, CLS dropped from output.
  * SigLIP so400m (siglip_encoder.py): no CLS, gelu_tanh, post-LN applied
    when select_layer is None (HF last_hidden_state semantics).

TPU-first notes: patch embedding is a reshape+matmul (MXU) rather than a
conv; images flow NHWC; attention is bidirectional (grp=0 everywhere).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.nn import core
from dexbotic_tpu.ops.attention import attention as _attention
from dexbotic_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int
    patch_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    act: str = "gelu_tanh"
    ln_eps: float = 1e-6
    use_cls: bool = False  # CLIP prepends a class token
    pre_ln: bool = False  # CLIP applies a LayerNorm before the encoder
    select_layer: Optional[int] = None  # None -> last_hidden_state (post-LN)
    drop_cls: bool = True  # drop CLS from returned features (LLaVA style)
    attn_impl: str = "xla"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid**2

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_cls else 0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_output_tokens(self) -> int:
        n = self.seq_len
        if self.use_cls and self.drop_cls:
            n -= 1
        return n


# Presets matching the reference defaults.
CLIP_VIT_L_336 = ViTConfig(
    image_size=336, patch_size=14, hidden_size=1024, num_layers=24, num_heads=16,
    intermediate_size=4096, act="quick_gelu", ln_eps=1e-5, use_cls=True,
    pre_ln=True, select_layer=-2, drop_cls=True,
)
SIGLIP_SO400M_384 = ViTConfig(
    image_size=384, patch_size=14, hidden_size=1152, num_layers=27, num_heads=16,
    intermediate_size=4304, act="gelu_tanh", select_layer=-2,
)
SIGLIP_SO400M_224 = dataclasses.replace(
    SIGLIP_SO400M_384, image_size=224, select_layer=None
)  # PaliGemma tower (pi0/pi0.5)


def _vit_layer_init(key, cfg: ViTConfig, dtype):
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
    }


def init_vit(key, cfg: ViTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    h = cfg.hidden_size
    params = {
        "patch_embed": {
            "w": core.normal_init(0.02)(
                ks[0], (cfg.patch_size * cfg.patch_size * 3, h), dtype
            ),
            "b": jnp.zeros((h,), dtype),
        },
        "pos_embed": core.normal_init(0.02)(ks[1], (cfg.seq_len, h), dtype),
        "layers": jax.vmap(lambda k: _vit_layer_init(k, cfg, dtype))(
            jax.random.split(ks[2], cfg.num_layers)
        ),
        "post_ln": {"w": jnp.ones((h,), jnp.float32), "b": jnp.zeros((h,), jnp.float32)},
    }
    if cfg.use_cls:
        params["cls"] = core.normal_init(0.02)(ks[3], (h,), dtype)
    if cfg.pre_ln:
        params["pre_ln"] = {
            "w": jnp.ones((h,), jnp.float32),
            "b": jnp.zeros((h,), jnp.float32),
        }
    return params


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, h*w, p*p*3] in (row, col, channel) patch order."""
    B, H, W, C = images.shape
    h, w = H // patch, W // patch
    x = images.reshape(B, h, patch, w, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B h w p p C
    return x.reshape(B, h * w, patch * patch * C)


def vit_forward(params, cfg: ViTConfig, images: jnp.ndarray,
                remat: bool = False) -> jnp.ndarray:
    """Encode images [B, H, W, 3] (already normalized) -> [B, N, hidden].

    Respects cfg.select_layer / drop_cls exactly as the reference's
    feature_select (siglip_encoder.py:61-65, clip_encoder.py:31-36).
    remat checkpoints each scan layer: a trained so400m tower's backward
    otherwise stashes every layer's attention/MLP internals
    ([27, B, 256, 1152]-shaped temps — what OOMed the 1b RL update).
    """
    B = images.shape[0]
    x = core.linear(params["patch_embed"], patchify(images, cfg.patch_size))
    if cfg.use_cls:
        cls = jnp.broadcast_to(
            params["cls"].astype(x.dtype)[None, None, :], (B, 1, x.shape[-1])
        )
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]
    if cfg.pre_ln:
        x = layer_norm(x, params["pre_ln"]["w"], params["pre_ln"]["b"], cfg.ln_eps)

    n_layers = cfg.num_layers
    if cfg.select_layer is not None:
        # hidden_states[l] is the INPUT of layer l; index -2 == output of the
        # penultimate layer == run all but the last layer.
        n_layers = cfg.num_layers + cfg.select_layer + 1
        assert 0 < n_layers <= cfg.num_layers

    S = x.shape[1]
    grp = jnp.zeros((B, S), jnp.int32)
    valid = jnp.ones((B, S), jnp.int32)

    def body(carry, lp):
        h = layer_norm(carry, lp["ln1"]["w"], lp["ln1"]["b"], cfg.ln_eps)
        q = core.linear(lp["attn"]["q"], h).reshape(B, S, cfg.num_heads, cfg.head_dim)
        k = core.linear(lp["attn"]["k"], h).reshape(B, S, cfg.num_heads, cfg.head_dim)
        v = core.linear(lp["attn"]["v"], h).reshape(B, S, cfg.num_heads, cfg.head_dim)
        a = _attention(q, k, v, grp, grp, valid, impl=cfg.attn_impl)
        a = core.linear(lp["attn"]["o"], a.reshape(B, S, -1))
        x1 = carry + a
        h2 = layer_norm(x1, lp["ln2"]["w"], lp["ln2"]["b"], cfg.ln_eps)
        m = core.linear(lp["mlp"]["fc2"], core.ACTIVATIONS[cfg.act](core.linear(lp["mlp"]["fc1"], h2)))
        return x1 + m, None

    layers = jax.tree.map(lambda p: p[:n_layers], params["layers"])
    if remat == "dots":  # save matmul outs, recompute elementwise only
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
    elif remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, layers)

    if cfg.select_layer is None:
        x = layer_norm(x, params["post_ln"]["w"], params["post_ln"]["b"], cfg.ln_eps)
    if cfg.use_cls and cfg.drop_cls:
        x = x[:, 1:]
    return x
