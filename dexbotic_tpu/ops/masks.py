"""Block-causal attention-mask construction.

The whole model zoo shares one mask formulation: each token carries an
``ar_mask`` bit that is 1 where previous tokens may NOT depend on it (i.e. it
opens a new autoregressive group) and 0 where it shares its group with the
previous token.  Token i may attend to token j iff
``cumsum(ar_mask)[j] <= cumsum(ar_mask)[i]`` and j is a valid (non-padding)
token.  This reproduces the reference semantics
(/root/reference/dexbotic/model/dm0/dm0_utils.py:12-75,
 /root/reference/dexbotic/model/pi0/pi0_arch.py:22-33) in vectorized jnp.

Special cases:
  * ar_mask all ones  -> standard causal mask.
  * ar_mask all zeros -> full bidirectional attention (e.g. image prefix).
"""

from __future__ import annotations

import jax.numpy as jnp

from dexbotic_tpu.constants import MASKED_BIAS


def make_attn_mask(input_mask: jnp.ndarray, ar_mask: jnp.ndarray) -> jnp.ndarray:
    """Boolean [B, N, N] mask from padding mask and autoregressive-group bits.

    Args:
      input_mask: bool[B, N], True for real tokens, False for padding.
      ar_mask: bool/int[B, N] or [N], 1 opens a new attention group.

    Returns:
      bool[B, N, N]; [b, i, j] True iff token i may attend to token j.
    """
    input_mask = input_mask.astype(bool)
    ar_mask = jnp.broadcast_to(ar_mask, input_mask.shape)
    cumsum = jnp.cumsum(ar_mask.astype(jnp.int32), axis=1)
    attn = cumsum[:, None, :] <= cumsum[:, :, None]
    valid = input_mask[:, None, :] & input_mask[:, :, None]
    return attn & valid


def make_suffix_attn_mask(
    suffix_input_mask: jnp.ndarray,
    suffix_ar_mask: jnp.ndarray,
    prefix_input_mask: jnp.ndarray,
    prefix_ar_mask: jnp.ndarray,
) -> jnp.ndarray:
    """bool[B, S, P+S] mask for suffix queries attending over prefix + suffix.

    Used by the pi0/DM0 denoise steps, where the suffix re-runs against a
    frozen prefix KV cache (/root/reference/dexbotic/model/dm0/dm0_utils.py:43-75).
    """
    suffix_len = suffix_ar_mask.shape[-1]
    prefix_ar_mask = jnp.broadcast_to(prefix_ar_mask, prefix_input_mask.shape)
    suffix_ar_mask = jnp.broadcast_to(suffix_ar_mask, suffix_input_mask.shape)
    input_mask = jnp.concatenate([prefix_input_mask, suffix_input_mask], axis=1)
    ar_mask = jnp.concatenate([prefix_ar_mask, suffix_ar_mask], axis=1)
    full = make_attn_mask(input_mask, ar_mask)
    return full[:, -suffix_len:, :]


def causal_mask(input_mask: jnp.ndarray) -> jnp.ndarray:
    """Standard causal mask as the all-ones ar_mask special case."""
    return make_attn_mask(input_mask, jnp.ones_like(input_mask, dtype=jnp.int32))


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool[B, M, N] -> additive bias [B, 1, M, N] (0 allowed / -huge blocked)."""
    return jnp.where(mask, 0.0, MASKED_BIAS)[:, None, :, :].astype(dtype)
