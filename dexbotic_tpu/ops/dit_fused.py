"""Fused DiT sampler: the ENTIRE diffusion sampling loop as ONE Pallas launch.

Why: at B=1 the CogACT action sampler (DDIM-10 x CFG over DiT-B, reference
/root/reference/dexbotic/model/cogact/cogact_arch.py:149-198) is
dispatch-bound in XLA — ~800 microsecond-scale fusions per chunk add ~6 us
of launch overhead each while the useful work is pure weight streaming
(DiT-B is 170 MB bf16; activations are ~50 KB).  This kernel runs all
`steps x depth` block evaluations inside one launch with a grid of
(step, layer): Pallas's pipeline prefetches layer j+1's weights from HBM
while layer j computes, so the sampler runs at max(weight-stream, compute)
instead of XLA's per-fusion dispatch floor.  With int8 weights the dequant
happens in-register on the streamed block — XLA materializes bf16 copies
instead (see BENCH_NOTES int8 study), which this kernel avoids by design.

Numerics match models/dit.py + ops/diffusion.py: bf16 matmuls with fp32
accumulation, fp32 non-affine LayerNorm, fp32 softmax, fp32 scheduler math.
Attention is computed per head on lane slices (S=chunk+1 is tiny), with a
batch-block-diagonal mask replacing the XLA path's per-row einsum.

Scope: serving-latency path for small batch (rows*S*depth attention is
unrolled per head); falls back to the XLA sampler for mem_cross_attn
(MemVLA) or large B — dispatched from models/cogact.py via
CogActConfig.fused_sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexbotic_tpu.nn import core
from dexbotic_tpu.ops.diffusion import DiffusionSchedule, ddim_timesteps
from dexbotic_tpu.ops.quant import is_quantized

_NEG = -2.3819763e38  # constants.MASKED_BIAS


def _ln(x):
    """Non-affine LayerNorm, fp32 math (ops/norms.py:layer_norm), eps 1e-6."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + 1e-6)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    # refs (order mirrors pallas_call in_specs)
    coef_ref,      # SMEM [N, 6] f32 scheduler coefficients, execution order
    cond_ref,      # [1, rows, H] per-step condition token (te[t_i] + z_embed)
    x0_ref,        # [B, T, A] f32 initial noise
    pos_ref,       # [S, H] positional embedding
    xw_ref, xb_ref,   # x_embed [A, H], [H]
    fw_ref, fb_ref,   # final layer [H, A], [A]
    wqkv_ref, sqkv_ref, bqkv_ref,   # [1, H, 3H](int8 q or dense), [1,1,3H]|None, [1, 3H]
    wo_ref, so_ref, bo_ref,         # [1, H, H]
    w0_ref, s0_ref, b0_ref,         # [1, H, M]
    w1_ref, s1_ref, b1_ref,         # [1, M, H]
    o_ref,         # out [B, T, A] f32
    x_s,           # scratch [B, T, A] f32 — current sample
    xp_s,          # scratch [B, T, A] f32 — DPM x0_prev
    h_s,           # scratch [rows*S, H] cdtype — residual stream
    *,
    B: int, T: int, A: int, H: int, heads: int, depth: int,
    cfg_pair: bool, cfg_scale: float, sampler: str, cdtype,
):
    i = pl.program_id(0)  # sampler step (execution order)
    j = pl.program_id(1)  # transformer layer
    S = T + 1
    rows = (2 if cfg_pair else 1) * B
    dh = H // heads

    def deq(w_ref, s_ref):
        w = w_ref[0]
        if s_ref is None:
            return w
        return w.astype(cdtype) * s_ref[0].astype(cdtype)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        x_s[...] = x0_ref[...]
        xp_s[...] = jnp.zeros_like(xp_s)

    @pl.when(j == 0)
    def _embed():
        x = x_s[...].reshape(B * T, A).astype(cdtype)
        xe = _dot(x, xw_ref[...].astype(cdtype)).astype(cdtype) + xb_ref[...].astype(cdtype)
        xe = xe.reshape(B, T, H)
        if cfg_pair:
            xe = jnp.concatenate([xe, xe], axis=0)  # halves share x (dit.py:191)
        c = cond_ref[0][:, None, :]  # [rows, 1, H]
        h = jnp.concatenate([c, xe], axis=1) + pos_ref[...].astype(cdtype)[None]
        h_s[...] = h.reshape(rows * S, H).astype(cdtype)

    # --- one DiT block (models/dit.py:163-179) ---
    h = h_s[...]
    hn = _ln(h).astype(cdtype)
    qkv = (_dot(hn, deq(wqkv_ref, sqkv_ref)) + bqkv_ref[0, 0].astype(jnp.float32)).astype(cdtype)

    R = rows * S
    blk_r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // S
    blk_c = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // S
    allowed = blk_r == blk_c
    scale = dh ** -0.5

    parts = []
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = qkv[:, sl].astype(jnp.float32) * scale
        kh = qkv[:, H + hh * dh: H + (hh + 1) * dh].astype(jnp.float32)
        vh = qkv[:, 2 * H + hh * dh: 2 * H + (hh + 1) * dh].astype(jnp.float32)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(allowed, s, _NEG)
        p = jax.nn.softmax(s, axis=-1)
        parts.append(_dot(p, vh))
    a = jnp.concatenate(parts, axis=-1).astype(cdtype)
    h = h + (_dot(a, deq(wo_ref, so_ref)) + bo_ref[0, 0].astype(jnp.float32)).astype(cdtype)

    hn3 = _ln(h).astype(cdtype)
    m = (_dot(hn3, deq(w0_ref, s0_ref)) + b0_ref[0, 0].astype(jnp.float32)).astype(cdtype)
    m = jax.nn.gelu(m, approximate=True)
    m = (_dot(m, deq(w1_ref, s1_ref)) + b1_ref[0, 0].astype(jnp.float32)).astype(cdtype)
    h = h + m
    h_s[...] = h

    @pl.when(j == depth - 1)
    def _sampler_step():
        hn = _ln(h_s[...]).astype(cdtype).reshape(rows, S, H)
        hs = hn[:, 1:, :].reshape(rows * T, H)  # drop cond token (dit.py:184)
        eps = _dot(hs, fw_ref[...].astype(cdtype)) + fb_ref[...].astype(jnp.float32)
        eps = eps.reshape(rows, T, A)
        if cfg_pair:
            cond_eps, uncond_eps = eps[:B], eps[B:]
            eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        x = x_s[...]
        if sampler == "ddim":
            # pred_x0 = (x - sqrt(1-a) eps)/sqrt(a); x' = sqrt(ap) x0 + sqrt(1-ap) eps
            c0, c1 = coef_ref[i, 0], coef_ref[i, 1]
            c2, c3 = coef_ref[i, 2], coef_ref[i, 3]
            pred_x0 = (x - c1 * eps) / c0
            x_s[...] = pred_x0 * c2 + c3 * eps
        else:  # dpm-solver++(2M), ops/diffusion.py:154-161
            a_s, s_s = coef_ref[i, 0], coef_ref[i, 1]
            sig_ratio, co, r = coef_ref[i, 2], coef_ref[i, 3], coef_ref[i, 4]
            x0 = (x - s_s * eps) / a_s
            d = (1.0 + r) * x0 - r * xp_s[...]
            x_s[...] = sig_ratio * x + co * d
            xp_s[...] = x0
        o_ref[...] = x_s[...]


def _stack_w(blocks_w):
    """Return (weight array [D,in,out], scales [D,1,out] or None) for a
    stacked linear weight that may be int8-quantized ({"q","s"})."""
    if is_quantized(blocks_w):
        q, s = blocks_w["q"], blocks_w["s"]
        out = s.shape[-1]
        if q.shape[-1] != out:  # quantized with pad_cols: slice once (traced)
            q = q[..., :out]
        return q, s
    return blocks_w, None


def fused_dit_sample(
    head: dict,
    dit_cfg,
    z: jnp.ndarray,          # [B, 1, token_size] cognition feature (cond)
    noise: jnp.ndarray,      # [B, chunk, action_dim] f32
    schedule: DiffusionSchedule,
    *,
    steps: int,
    cfg_scale: float,
    sampler: str = "ddim",
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the full CFG x DiT sampling loop in one Pallas launch.

    Matches ddim_sample/dpm_solver_pp_2m over dit_forward_with_cfg
    (cfg_scale>1) or dit_forward (cfg_scale<=1).  Embedding-side projections
    (t_mlp, z_embed) and scheduler coefficients are precomputed in XLA —
    they are per-call, not per-step.  Returns [B, chunk, action_dim] f32.
    """
    cfg = dit_cfg
    B, T, A = noise.shape
    H, depth, heads = cfg.hidden_size, cfg.depth, cfg.num_heads
    S = T + 1
    cfg_pair = cfg_scale > 1.0
    rows = (2 if cfg_pair else 1) * B

    xw = head["x_embed"]["w"]
    cdtype = xw["s"].dtype if isinstance(xw, dict) else xw.dtype

    # ---- scheduler coefficients + timesteps, execution order (host math) ----
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    kept = ddim_timesteps(schedule.num_steps, steps)
    N = steps
    C = np.zeros((N, 6), np.float32)
    if sampler == "ddim":
        ab = acp[kept][::-1]                       # execution order: T -> 0
        ab_prev = np.concatenate([[1.0], acp[kept][:-1]])[::-1]
        ts_exec = np.asarray(kept[::-1], np.float64)
        C[:, 0] = np.sqrt(ab)
        C[:, 1] = np.sqrt(1.0 - ab)
        C[:, 2] = np.sqrt(ab_prev)
        C[:, 3] = np.sqrt(1.0 - ab_prev)
    elif sampler == "dpm":
        ab_src = acp[kept][::-1]
        ab_tgt = np.concatenate([ab_src[1:], [1.0]])
        a_s, s_s = np.sqrt(ab_src), np.sqrt(1.0 - ab_src)
        a_t, s_t = np.sqrt(ab_tgt), np.sqrt(1.0 - ab_tgt)
        with np.errstate(divide="ignore"):
            lam_s = np.log(a_s / s_s)
            lam_t = np.log(a_t / np.where(s_t == 0.0, 1e-300, s_t))
        hh = lam_t - lam_s
        h_prev = np.concatenate([[np.inf], hh[:-1]])
        inv_2r = np.where(np.isfinite(hh), h_prev / (2.0 * hh), 0.0)
        inv_2r = np.where(np.isfinite(inv_2r), inv_2r, 0.0)
        C[:, 0] = a_s
        C[:, 1] = s_s
        C[:, 2] = np.where(s_s > 0, s_t / s_s, 0.0)
        C[:, 3] = -a_t * (np.exp(-hh) - 1.0)
        C[:, 4] = inv_2r
        ts_exec = np.asarray(kept[::-1], np.float64)
    else:
        raise ValueError(f"unknown sampler {sampler!r}")

    # ---- per-call XLA precompute: condition tokens for every step ----
    half = cfg.freq_embed_size // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = ts_exec[:, None] * freqs[None]
    te = np.concatenate([np.cos(args), np.sin(args)], axis=1).astype(np.float32)
    te = jnp.asarray(te).astype(cdtype)  # [N, freq]
    te = core.linear(head["t_mlp"]["fc1"],
                     jax.nn.silu(core.linear(head["t_mlp"]["fc0"], te)))  # [N, H]

    zc = z[:, 0, :].astype(cdtype)
    if cfg_pair:
        zu = jnp.broadcast_to(head["uncondition"].astype(cdtype)[None], zc.shape)
        zc = jnp.concatenate([zc, zu], axis=0)  # [rows, token]
    ze = core.linear(head["z_embed"], zc)  # [rows, H]
    cond_all = (te[:, None, :] + ze[None, :, :]).astype(cdtype)  # [N, rows, H]

    wqkv, sqkv = _stack_w(head["blocks"]["attn"]["qkv"]["w"])
    wo, so = _stack_w(head["blocks"]["attn"]["o"]["w"])
    w0, s0 = _stack_w(head["blocks"]["mlp"]["fc0"]["w"])
    w1, s1 = _stack_w(head["blocks"]["mlp"]["fc1"]["w"])
    # biases as [depth, 1, out]: Pallas blocks need last-two dims (sublane,
    # lane)-tileable or equal to the array dims
    bqkv = head["blocks"]["attn"]["qkv"]["b"][:, None, :]
    bo = head["blocks"]["attn"]["o"]["b"][:, None, :]
    b0 = head["blocks"]["mlp"]["fc0"]["b"][:, None, :]
    b1 = head["blocks"]["mlp"]["fc1"]["b"][:, None, :]

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    # Stacked [depth, ...] tensors stream one layer block per grid step.
    def blk(arr):
        return pl.BlockSpec((1,) + arr.shape[1:], lambda i, j: (j,) + (0,) * (arr.ndim - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # coef
        pl.BlockSpec((1, rows, H), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),                      # cond_all
        full(),                                                     # x0
        full(),                                                     # pos
        full(), full(),                                             # xw, xb
        full(), full(),                                             # fw, fb
    ]
    args_list = [
        jnp.asarray(C), cond_all, noise.astype(jnp.float32),
        head["pos_embed"],
        head["x_embed"]["w"] if not isinstance(xw, dict) else None,
        head["x_embed"]["b"],
        head["final"]["w"], head["final"]["b"],
    ]
    # x_embed may be quantized (token-size-dependent); dequantize tiny [A,H]
    if isinstance(xw, dict):
        from dexbotic_tpu.ops.quant import dequantize_weight
        args_list[4] = dequantize_weight(xw)
    fw = head["final"]["w"]
    if isinstance(fw, dict):
        from dexbotic_tpu.ops.quant import dequantize_weight
        args_list[6] = dequantize_weight(fw)

    for w, s, b in ((wqkv, sqkv, bqkv), (wo, so, bo), (w0, s0, b0), (w1, s1, b1)):
        in_specs.append(blk(w))
        args_list.append(w)
        if s is not None:
            in_specs.append(blk(s))
            args_list.append(s)
        else:
            in_specs.append(None)
            args_list.append(None)
        in_specs.append(blk(b))
        args_list.append(b)

    # pallas_call can't take None args: drop them and let the kernel receive
    # None via closure over presence flags.
    present = [a is not None for a in args_list]
    live_specs = [s for s, p in zip(in_specs, present) if p]
    live_args = [a for a in args_list if a is not None]

    kern = functools.partial(
        _kernel_dispatch, present=tuple(present),
        B=B, T=T, A=A, H=H, heads=heads, depth=depth,
        cfg_pair=cfg_pair, cfg_scale=float(cfg_scale), sampler=sampler,
        cdtype=cdtype,
    )

    out = pl.pallas_call(
        kern,
        grid=(N, depth),
        in_specs=live_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, A), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, T, A), jnp.float32),
            pltpu.VMEM((B, T, A), jnp.float32),
            pltpu.VMEM((rows * S, H), cdtype),
        ],
        # double-buffered bf16 DiT-B block weights are ~28 MB — above the
        # 16 MB default scoped-vmem budget, well under the 128 MB chip VMEM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*live_args)
    return out


def _kernel_dispatch(*refs, present, **kw):
    """Re-inserts None for absent (non-quantized scale) args, then calls
    _kernel with the canonical 19-ref signature."""
    n_in = len(present)
    it = iter(refs[: sum(present)])
    ins = [next(it) if p else None for p in present]
    rest = refs[sum(present):]  # o_ref + scratches
    _kernel(*ins, *rest, **kw)
