"""Pallas int8-weight matmul: stream int8 from HBM, dequantize in-register.

Motivation (BENCH_NOTES "Weight-only int8 serving"): XLA does not fuse the
int8->bf16 dequantize converts into dot operands — it materializes bf16
copies of every weight per request, so plain-XLA weight-only int8 pays
int8-read + bf16-write + bf16-read (2.5x the weight traffic of bf16) and
serves ~2.5x SLOWER at B=1.  This kernel streams weight tiles as int8 (half
of bf16's bytes), converts in VMEM/registers, runs the MXU in the compute
dtype with fp32 accumulation, and applies the per-output-channel scale once
on the way out.

Schedule: grid (N-blocks, K-blocks), K innermost so the fp32 accumulator
scratch carries across the reduction.  Every N-block re-reads the whole
activation (``nN * M * K`` traffic), so the N-block must be LARGE for the
int8 savings to win — which is why ``ops/quant.quantize_weight`` zero-pads
the weight out-dim to 1024-multiples at load (the scale keeps the true
out-dim; padding per-call would re-create the traffic this kernel removes).
``_pick_bn`` then takes the largest 128-aligned divisor of the padded
out-dim that fits VMEM.  The kernel targets the latency regime (M <= 1024
activation rows — B=1/B=2 serving); at large M matmuls are compute-bound
and the XLA fallback is fine.

Inference-only: quantized trees exist only in serving (no custom VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_K_CANDIDATES = (512, 256, 128, 64, 32)  # int8 min tile: (32, 128)
_MAX_M = 64
# Measured negative result (BENCH_NOTES round-2 int8 study): on v5e the
# kernel loses to XLA's dequant formulation end-to-end at 7b in EVERY
# dispatch regime tried (all-M 13.5, M<=64 14.8, vs 16.3 chunks/s XLA) —
# the prefill is MXU-compute-bound at M=hundreds, and even the few-row DiT
# phase shows no net win against XLA's fused tiling on this chip.  The
# kernel stays available (correctness-tested, interpret + on-chip) as the
# base for a future W8A8 schedule (int8 MXU measured 2.5x bf16), but
# dispatch is OFF by default.
KERNEL_DISPATCH = False
# acc + out + double-buffered x/w tiles must fit v5e VMEM (~16 MB) with room
# for the compiler; budget conservatively.
_VMEM_BUDGET = 11 * 1024 * 1024


def _pad_m(m: int) -> int:
    return max(16, ((m + 15) // 16) * 16)


def _vmem_bytes(mp: int, bk: int, bn: int, itemsize: int) -> int:
    acc = mp * bn * 4
    out = mp * bn * itemsize
    tiles = 2 * (mp * bk * itemsize) + 2 * (bk * bn)
    return acc + out + tiles


def _pick_bk(k: int) -> int:
    for c in _BLOCK_K_CANDIDATES:
        if k % c == 0:
            return c
    return 0


def _pick_bn(np_: int, mp: int, bk: int, itemsize: int) -> int:
    best = 0
    for bn in range(128, np_ + 1, 128):
        if np_ % bn == 0 and _vmem_bytes(mp, bk, bn, itemsize) <= _VMEM_BUDGET:
            best = bn
    return best


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = q_ref[...].astype(x.dtype)  # int8 -> compute dtype, in VMEM
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _flush():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def quant_matmul_eligible(M: int, K: int, Np: int, itemsize: int = 2) -> bool:
    """Kernel handles this shape (Np = PADDED out-dim) in the latency regime?"""
    if M > _MAX_M:
        return False
    bk = _pick_bk(K)
    if not bk:
        return False
    return _pick_bn(Np, _pad_m(M), bk, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_matmul(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """out[M, N] = (x[M, K] @ q[K, Np])[:, :N] * s[., N]; q streamed as int8.

    ``q`` may carry zero-padded columns (Np >= N = s's last axis)."""
    M, K = x.shape
    Kq, Np = q.shape
    N = s.shape[-1]
    assert K == Kq, (x.shape, q.shape)
    bk = _pick_bk(K)
    mp = _pad_m(M)
    bn = _pick_bn(Np, mp, bk, x.dtype.itemsize)
    assert bk and bn, (
        f"shape ({M},{K},{Np}) not kernel-eligible; guard with quant_matmul_eligible"
    )
    if mp != M:
        x = jnp.pad(x, ((0, mp - M), (0, 0)))
    sp = s.reshape(1, N)
    if Np != N:
        sp = jnp.pad(sp, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        _kernel,
        grid=(Np // bn, K // bk),
        in_specs=[
            pl.BlockSpec((mp, bk), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (mp, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * K * Np,
            bytes_accessed=(Np // bn) * mp * K * x.dtype.itemsize
            + K * Np + mp * Np * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, sp)
    return out[:M, :N]


# W8A8: when set, quant_linear runs int8 activations x int8 weights on the
# int8 MXU (2.5x bf16 peak, BENCH_NOTES int8 study) for matmuls with at
# least this many activation rows — the BATCHED-prefill regime; below it
# the MXU is latency-bound either dtype and the dequant path stays.  Read
# at TRACE time: configure before the serving program first compiles
# (exp inference_quantize="w8a8").  None = off (weight-only dequant).
W8A8_MIN_ROWS: int | None = None


def w8a8_matmul(x2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """[M, K] activations x int8 [K, Np] weights via the int8 MXU.

    Activations are quantized per-ROW (dynamic absmax -> int8) and weights
    carry their per-COLUMN scales; the int32 accumulator is rescaled by
    (row_scale x col_scale) on the way out, i.e. out[m, n] differs from the
    fp32 product only by the two rounding steps (~0.5% relative).
    """
    N = s.shape[-1]
    amax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q[..., :N], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * s.reshape(1, N).astype(jnp.float32)


def quant_linear(p: dict, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for nn.core.linear when p["w"] is a quantized {"q","s"} dict.

    Dispatch order: W8A8 int8-MXU matmul when enabled and the row count
    reaches W8A8_MIN_ROWS; else the Pallas int8-weight-streaming kernel
    when the shape qualifies; else the XLA dequant formulation
    ((x @ q[:, :N]) * s — identical numerics up to fp32 association).
    """
    w = p["w"]
    q, s = w["q"], w["s"]
    K, Np = q.shape[-2:]
    N = s.shape[-1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    if W8A8_MIN_ROWS is not None and M >= W8A8_MIN_ROWS:
        out = w8a8_matmul(x2, q, s).astype(x.dtype)
    else:
        use_kernel = interpret or (
            KERNEL_DISPATCH
            and jax.default_backend() == "tpu"
            and quant_matmul_eligible(M, K, Np, x.dtype.itemsize)
        )
        if use_kernel:
            out = quant_matmul(x2, q, s.astype(x.dtype), interpret=interpret)
        else:
            out = (x2 @ q[..., :N].astype(x.dtype)) * s.reshape(1, N).astype(x.dtype)
    out = out.reshape(*lead, N)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out
