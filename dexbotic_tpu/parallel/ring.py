"""Ring attention: context-parallel (sequence-sharded) exact attention.

Long-context packed training (NaVILA 4k+ streams, SURVEY §5 long-context
row) eventually outgrows one chip's HBM *in activations*: every tensor in
the layer stack is O(S).  Context parallelism shards the sequence axis over
a mesh axis — every per-token op (norms, QKV/MLP matmuls, residuals) is
embarrassingly parallel, and attention, the one op that mixes positions,
becomes a ring: each device keeps its resident query block and passes its
(k, v, mask-metadata) block around the ring with `lax.ppermute`, folding
one block per step into a running online-softmax accumulator
(FlashAttention's m/l recurrence, fp32).  After `seq` steps every query has
seen every key, communication rides the ICI ring, and no device ever holds
more than S/n of any tensor — the [S, S] score matrix is never formed.

Design choices (TPU/JAX-first):
* Masking uses the framework's group-int formulation (ops/attention.py):
  the kv block carries its (grp, valid, seg) ints around the ring, so
  causal/prefix/packed-segment semantics are position-independent — no
  global index bookkeeping, and any mask the zoo uses works under CP
  unchanged.
* The masked bias is the finite MASKED_BIAS (not -inf), matching
  attention_xla's semantics exactly — fully-masked rows degrade to the
  same uniform average instead of NaN, so parity with the single-device
  path holds bit-for-bit in the places the model actually reads.
* The ring loop is a `lax.scan` over `ppermute`; reverse-mode AD
  differentiates it directly (ppermute transposes to the inverse ring, the
  same trick parallel/pipeline.py uses), so the backward pass is also a
  ring and grads of sequence-sharded params/activations come out sharded.
* Integration is via the attention dispatch: `attn_impl="ring:<axis>"` on
  any TransformerConfig runs that model's attention as a ring when called
  inside `shard_map` with the sequence axis sharded (see
  tests/test_ring.py for the packed-trainer pattern).

The reference has no context parallelism at all (its NaVILA packing is
single-GPU, /root/reference/dexbotic/exp/navila_exp.py); this is
beyond-reference scaling surface, following the blockwise-parallel /
ring-attention formulation (Liu et al., 2023) on XLA collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import MASKED_BIAS

__all__ = ["ring_attention"]


def ring_attention(
    q: jnp.ndarray,  # [B, Sl, Hq, D] local query block
    k: jnp.ndarray,  # [B, Sl, Hkv, D] local key block
    v: jnp.ndarray,  # [B, Sl, Hkv, D] local value block
    q_grp: jnp.ndarray,  # int[B, Sl] attention groups of local queries
    kv_grp: jnp.ndarray,  # int[B, Sl] attention groups of local keys
    kv_valid: jnp.ndarray,  # int/bool[B, Sl]
    axis_name: str,
    scale: float | None = None,
    q_seg: jnp.ndarray | None = None,
    kv_seg: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact attention over a sequence sharded on `axis_name`.

    Must be called inside `shard_map` (or an equivalent SPMD region) where
    the sequence axis of q/k/v/metadata is sharded over `axis_name`.  Group
    ints are GLOBAL values — the caller shards them alongside the tokens.
    Returns the local [B, Sl, Hq, D] output block in q.dtype.
    """
    B, Sl, Hq, D = q.shape
    _, Skl, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.astype(jnp.float32) * scale
    q_grp = q_grp.astype(jnp.int32)
    q_seg_arr = (jnp.zeros(q_grp.shape, jnp.int32) if q_seg is None
                 else q_seg.astype(jnp.int32))

    def fold(carry_o, carry_m, carry_l, kb, vb, gb, valb, sb):
        """Fold one kv block into the (o, m, l) online-softmax state."""
        kf = kb.astype(jnp.float32)
        vf = vb.astype(jnp.float32)
        if group > 1:
            kf = jnp.repeat(kf, group, axis=2)
            vf = jnp.repeat(vf, group, axis=2)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
        allowed = (gb[:, None, :] <= q_grp[:, :, None]) & valb[:, None, :].astype(bool)
        allowed = allowed & (sb[:, None, :] == q_seg_arr[:, :, None])
        scores = jnp.where(allowed[:, None, :, :], scores, MASKED_BIAS)
        m_new = jnp.maximum(carry_m, scores.max(axis=-1))
        alpha = jnp.exp(carry_m - m_new)  # finite: both >= MASKED_BIAS
        p = jnp.exp(scores - m_new[..., None])
        l_new = carry_l * alpha + p.sum(axis=-1)
        o_new = carry_o * alpha[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vf)
        return o_new, m_new, l_new

    def step(carry, _):
        o, m, l, blk = carry
        kb, vb, gb, valb, sb = blk
        o, m, l = fold(o, m, l, kb, vb, gb, valb, sb)
        blk = jax.lax.ppermute(blk, axis_name, perm)
        return (o, m, l, blk), None

    # derive the initial accumulators from qf so they inherit its varying
    # manual axes (a plain jnp.zeros is device-invariant inside shard_map
    # and lax.scan rejects the carry-type mismatch)
    tq = jnp.transpose(qf, (0, 2, 1, 3))  # [B, Hq, Sl, D]
    o0 = tq * 0.0
    m0 = tq[..., 0] * 0.0 + MASKED_BIAS
    l0 = tq[..., 0] * 0.0
    kv_seg_arr = (jnp.zeros(kv_grp.shape, jnp.int32) if kv_seg is None
                  else kv_seg.astype(jnp.int32))
    blk0 = (k, v, kv_grp.astype(jnp.int32), kv_valid.astype(jnp.int32),
            kv_seg_arr)

    (o, _, l, _), _ = jax.lax.scan(step, (o0, m0, l0, blk0), None, length=n)
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)
