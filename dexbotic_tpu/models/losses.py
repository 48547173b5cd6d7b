"""Shared losses."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import IGNORE_INDEX


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Next-token CE with IGNORE_INDEX masking (HF shift semantics).

    logits [B, S, V] fp-any; labels int[B, S].  Mean over unmasked targets.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


def soft_cross_entropy_gaussian(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    soft_tokens: jnp.ndarray,
    std: float = 1.0,
) -> jnp.ndarray:
    """NaVILA's soft CE: probability spread over numeric 'time' tokens with a
    Gaussian centered at the target (reference: model/navila/loss.py:11-71).

    soft_tokens: int[K] vocabulary ids forming the ordered numeric-token set.
    Targets that are members of soft_tokens get a Gaussian soft label over the
    set; other targets fall back to hard CE.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)

    # position of each target within the soft-token set (-1 if absent)
    eq = safe[..., None] == soft_tokens[None, None, :]  # [B, S, K]
    in_set = jnp.any(eq, axis=-1)
    pos = jnp.argmax(eq, axis=-1)  # valid only where in_set

    k = jnp.arange(soft_tokens.shape[0], dtype=jnp.float32)
    gauss = jnp.exp(-0.5 * ((k[None, None, :] - pos[..., None]) / std) ** 2)
    gauss = gauss / jnp.sum(gauss, axis=-1, keepdims=True)

    logp = jax.nn.log_softmax(logits, axis=-1)
    soft_logp = jnp.take(logp, soft_tokens, axis=-1)  # [B, S, K]
    soft_nll = -jnp.sum(gauss * soft_logp, axis=-1)
    hard_nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]

    nll = jnp.where(in_set, soft_nll, hard_nll)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom
