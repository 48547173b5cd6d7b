"""Weight-only int8 quantization for serving.

The reference serves bf16/fp16 checkpoints as-is (no quantization support;
/root/reference/dexbotic/exp/base_exp.py:714-760 loads bf16) — this is a
TPU-native extension: storing linear weights as int8 + per-output-channel
scales halves (vs bf16) or quarters (vs fp32) the HBM footprint and the
weight bytes each matmul streams, which is the binding constraint for
single-chip serving (a 7B-class CogACT is 13.5 GB in bf16 and does not fit
a 16 GB v5e; int8 does).

Representation: a quantized weight replaces the ``"w"`` array of a linear
param dict (see nn/core.py) with ``{"q": int8[..., in, out],
"s": [..., 1, out]}`` where ``w ≈ q * s`` (symmetric, per-out-channel).
``nn.core.linear`` computes ``(x @ q) * s`` — exact for the per-channel
factorization — so no model code changes; embeddings quantize per-row
(``{"q": int8[V, D], "s": [V, 1]}``) and are handled by ``nn.core.embed``
and the tied-embedding head in ``nn.transformer.lm_logits``.

Stacked-layer trees (leading ``[L, ...]`` axis from vmapped init) quantize
with per-(layer, channel) scales and slice correctly under ``lax.scan``.

Quantization is an inference-time pytree transform: train/checkpoint in
bf16/fp32, quantize after loading.  Scales are stored in the weight's
original dtype so the quantized model preserves the tree's dtype policy.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

# Quantize only weights at least this large (bytes saved must dwarf the
# extra scale/dequant work; small heads/projections stay exact).
DEFAULT_MIN_SIZE = 1 << 16


def _pad_cols_to(n: int) -> int:
    """Padded out-dim for linear weights: multiples of 1024 (>=1024) or 128.

    Padding happens ONCE at quantization so the Pallas int8 matmul kernel
    (ops/quant_matmul.py) can tile the out dim with large blocks — fewer
    activation re-reads per matmul.  Zero columns contribute nothing; the
    true out-dim is recovered from the scale's last axis."""
    if n < 128:  # below one lane tile the kernel never applies — don't pad
        return n
    # big dims: big blocks.  Worst case waste is just under 25% (n=4097 ->
    # 5120); typical transformer dims (multiples of 256) waste far less.
    mult = 1024 if n >= 4096 else 128
    return ((n + mult - 1) // mult) * mult


def quantize_weight(w: jnp.ndarray, axis: int = -2, pad_cols: bool = False) -> dict:
    """Symmetric int8 quantization with max-abs scales over ``axis``.

    ``axis=-2`` (default) = per-output-channel for ``[..., in, out]`` linear
    weights; ``axis=-1`` = per-row for ``[V, D]`` embeddings.  With
    ``pad_cols`` (linear weights only) ``q``'s last axis is zero-padded to a
    kernel-friendly multiple while ``s`` keeps the true out-dim.

    Memory discipline: |w| and max are exact in the stored dtype, so the
    scale needs no fp32 copy of ``w``; the fp32 rounding of big stacked
    leaves is chunked over the layer axis (a 7B tree is quantized while the
    full bf16 tree is still resident — a whole-leaf fp32 copy of a 2.9 GB
    layer stack would OOM a 16 GB chip).
    """
    import jax

    w = jnp.asarray(w)
    s = jnp.max(jnp.abs(w), axis=axis, keepdims=True).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, 1e-12)

    def q_of(wi, si):
        return jnp.clip(jnp.round(wi.astype(jnp.float32) / si), -127, 127).astype(jnp.int8)

    if w.ndim >= 3 and w.size * 4 > (1 << 28):  # >256 MB fp32 transient
        q = jax.lax.map(lambda ws: q_of(*ws), (w, s))
    else:
        q = q_of(w, s)
    if pad_cols and axis == -2:
        n = q.shape[-1]
        np_ = _pad_cols_to(n)
        if np_ != n:
            widths = [(0, 0)] * (q.ndim - 1) + [(0, np_ - n)]
            q = jnp.pad(q, widths)
    return {"q": q, "s": s.astype(w.dtype)}


def dequantize_weight(d: dict) -> jnp.ndarray:
    q, s = d["q"], d["s"]
    if s.shape[-1] > 1:  # linear form: s carries the true (unpadded) out-dim
        q = q[..., : s.shape[-1]]
    return (q.astype(jnp.float32) * s.astype(jnp.float32)).astype(s.dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "s"}


def _eligible(v: Any, min_size: int) -> bool:
    return (
        hasattr(v, "ndim")
        and v.ndim >= 2
        and v.size >= min_size
        and jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
    )


# Norm param dicts are also {"w"(, "b")} (rms_norm / layer_norm weights, e.g.
# "ln1"/"norm"/"q_norm" — see nn/transformer.py:_norm_init, nn/vit.py); their
# "w" is a per-feature scale, not a matmul operand, and when layers are
# vmap-stacked it is 2-D — so eligibility must be structural, not shape-based.
_NORM_NAME_MARKERS = ("ln", "norm")


def _is_norm_name(name: str) -> bool:
    n = name.lower()
    return any(m in n for m in _NORM_NAME_MARKERS)


def quantize_params(
    tree: Any,
    min_size: int = DEFAULT_MIN_SIZE,
    quantize_embed: bool = True,
    in_place: bool = False,
    pad_cols: bool | None = None,
) -> Any:
    """Walk a param tree; replace large linear ``"w"`` (and optionally
    ``"embedding"``) arrays with int8 quantized dicts.  Everything else
    (biases, norm scales, small heads) is returned unchanged.

    ``in_place=True`` mutates the dicts so each original weight loses its
    last reference (and its device buffer) as soon as it is quantized —
    required when the unquantized tree barely fits HBM (the 7B class on one
    16 GB chip): a functional copy would briefly hold both trees.

    ``pad_cols`` (default: follow ``quant_matmul.KERNEL_DISPATCH``) zero-pads
    linear out-dims for the Pallas kernel's tiling; pointless extra HBM when
    the kernel dispatch is off.
    """
    if pad_cols is None:
        from dexbotic_tpu.ops.quant_matmul import KERNEL_DISPATCH

        pad_cols = KERNEL_DISPATCH

    def rec(node, name=""):
        if isinstance(node, dict):
            is_norm = _is_norm_name(name)
            out = node if in_place else {}
            for k in list(node):
                v = node[k]
                if k == "w" and not is_norm and _eligible(v, min_size):
                    out[k] = quantize_weight(v, axis=-2, pad_cols=pad_cols)
                elif k == "embedding" and quantize_embed and _eligible(v, min_size):
                    out[k] = quantize_weight(v, axis=-1)
                else:
                    out[k] = rec(v, k)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, name) for v in node)
        return node

    return rec(tree)


def quantized_bytes(tree: Any) -> int:
    """Total parameter bytes of a (possibly partially quantized) tree."""
    import jax

    return sum(
        int(np.prod(l.shape)) * jnp.asarray(l).dtype.itemsize
        for l in jax.tree_util.tree_leaves(tree)
    )
