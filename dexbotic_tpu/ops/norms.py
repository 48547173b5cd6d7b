"""Normalization ops: RMSNorm, gated adaptive RMSNorm, LayerNorm.

Computed in fp32 regardless of input dtype (TPU norm-stability rule; matches
the reference's fp32-norm policy, /root/reference/dexbotic/model/dm0/dm0_arch.py:108-125).
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 1e-6,
    weight_offset: float = 0.0,
) -> jnp.ndarray:
    """RMSNorm.  Gemma-family uses weight_offset=1.0 (scale = 1 + w)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    out = normed * (weight_offset + weight.astype(jnp.float32))
    return out.astype(dtype)


def ada_rms_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    cond_scale: jnp.ndarray,
    eps: float = 1e-6,
    weight_offset: float = 0.0,
) -> jnp.ndarray:
    """Adaptive RMSNorm: per-sample scale from a conditioning vector.

    ``cond_scale`` is the projected condition (e.g. flow time embedding),
    shape [B, D] or [B, 1, D]; output = rms_norm(x) * (1 + cond_scale).
    Used by the pi0.5 action expert (/root/reference/dexbotic/model/pi05/
    transformers_pi05/gemma/modeling_gemma.py:62).
    """
    normed = rms_norm(x, weight, eps=eps, weight_offset=weight_offset)
    if cond_scale.ndim == normed.ndim - 1:
        cond_scale = cond_scale[:, None, :]
    return (normed.astype(jnp.float32) * (1.0 + cond_scale.astype(jnp.float32))).astype(
        x.dtype
    )


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm with optional affine params (None = non-affine, DiT style)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed.astype(dtype)
