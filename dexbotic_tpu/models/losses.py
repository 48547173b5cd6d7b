"""Shared losses."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import IGNORE_INDEX


def token_nll(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    soft_tokens: jnp.ndarray | None = None,
    std: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token NLL with NO shift: (nll fp32 [B, S], mask bool [B, S]).

    The shared core of causal_lm_loss / soft_cross_entropy_gaussian —
    callers shift logits/labels themselves.  Shifting outside the core is
    what lets the context-parallel packed loss (models/navila.py) pre-shift
    labels at full sequence length and reduce per-shard sums with psum,
    instead of shifting across shard boundaries.
    """
    logits = logits.astype(jnp.float32)
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    hard_nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if soft_tokens is None:
        return hard_nll, mask

    # position of each target within the soft-token set (-1 if absent)
    eq = safe[..., None] == soft_tokens[None, None, :]  # [B, S, K]
    in_set = jnp.any(eq, axis=-1)
    pos = jnp.argmax(eq, axis=-1)  # valid only where in_set

    k = jnp.arange(soft_tokens.shape[0], dtype=jnp.float32)
    gauss = jnp.exp(-0.5 * ((k[None, None, :] - pos[..., None]) / std) ** 2)
    gauss = gauss / jnp.sum(gauss, axis=-1, keepdims=True)

    soft_logp = jnp.take(logp, soft_tokens, axis=-1)  # [B, S, K]
    soft_nll = -jnp.sum(gauss * soft_logp, axis=-1)
    return jnp.where(in_set, soft_nll, hard_nll), mask


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Next-token CE with IGNORE_INDEX masking (HF shift semantics).

    logits [B, S, V] fp-any; labels int[B, S].  Mean over unmasked targets.
    """
    nll, mask = token_nll(logits[:, :-1], labels[:, 1:])
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
    nll, mask = token_nll(logits[:, :-1], labels[:, 1:],
                          soft_tokens=soft_tokens, std=std)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom
