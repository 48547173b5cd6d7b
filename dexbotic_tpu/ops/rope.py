"""Rotary position embeddings (HF rotate-half layout).

All backbones (LLaMA/Qwen/Gemma family) use the non-interleaved "rotate half"
RoPE convention so converted HF checkpoints drop straight in
(behavior pinned by transformers' ``apply_rotary_pos_emb`` used at
/root/reference/dexbotic/model/pi0/pi0_arch.py:8-9,168-170).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions.

    Args:
      positions: int[..., S] token positions (may be per-batch ragged cumsums).
      head_dim: per-head dimension (even).
      theta: rope base frequency.

    Returns:
      (cos, sin) float[..., S, head_dim].
    """
    fraction = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (theta**fraction)  # [D/2]
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, D/2]
    emb = jnp.concatenate([angles, angles], axis=-1)  # [..., S, D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply RoPE to [B, S, H, D] given cos/sin [B, S, D] (fp32 internally)."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    cos = cos[..., None, :].astype(jnp.float32)  # [B, S, 1, D]
    sin = sin[..., None, :].astype(jnp.float32)
    out = x * cos + _rotate_half(x) * sin
    return out.astype(orig_dtype)
