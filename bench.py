"""Benchmark: action-chunk inference throughput on the real TPU chip.

Measures the north-star metric (BASELINE.json): frame->action-chunk
inference fused into ONE jitted program, in action chunks/sec/chip.
BENCH_MODEL=cogact (default): ViT + LLM prefill + DDIM-10 with CFG.
BENCH_MODEL=pi0: 3-view SigLIP + PaliGemma-class prefill + 10 Euler steps
against the frozen prefix KV cache.
BENCH_MODEL=oft: OFT-L1 single-forward regression head.

Timing integrity (round-3 fix, VERDICT r2): EVERY data input of the timed
scan body — ids, masks, images, states — is REGENERATED from the
per-iteration rng inside the body (jax.random on device; noise costs
nothing next to the model FLOPs).  Loop-invariant inputs let XLA hoist the
ViT encode + LLM prefill out of the 20-iteration scan and time only the
sampler (round-2 headline numbers implied up to 8x the chip's peak
FLOP/s); an ``optimization_barrier`` tying inputs to the rng is NOT
sufficient — XLA deletes the barrier and hoists anyway (verified by HLO
inspection on this backend), which the OFT-L1 rerun demonstrated at an
implied 1213 TFLOP/s.  Weights stay loop-invariant arguments — real
serving reuses them and every matmul streams them from HBM regardless
(quantized weights additionally get the dequant barrier, see
_fresh_params).  As a harness self-check we compute analytic matmul FLOPs
per chunk from the config and ASSERT the implied TFLOP/s is below the
chip's peak before printing; achieved TFLOP/s and MFU are printed next to
chunks/s so inflation is visible.

The reference publishes no throughput numbers (SURVEY.md §6); `vs_baseline`
divides by a FLOP-DERIVED BOUND on an A100 running the same model — A100
dense-bf16 peak (312 TFLOP/s) x an assumed 25% serving MFU, which favors
the baseline (see BASELINE_KIND below and BASELINE.md "Throughput
baseline").  Ratios are therefore LOWER bounds on the speedup vs the
reference's own eager-torch serving loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import time



# "1b-class" default: large enough to exercise the MXU, small enough to
# compile fast through the axon tunnel.  Override with BENCH_SCALE=7b later.
SCALE = os.environ.get("BENCH_SCALE", "1b")

# BENCH_QUANT=int8: weight-only int8 serving (ops/quant.py).  Halves weight
# HBM traffic vs bf16 and fits the 7B class on one 16 GB v5e chip.
QUANT = os.environ.get("BENCH_QUANT", "")

# v5e nominal peak (bf16 MXU).  Weight-only int8 still computes in bf16
# (XLA materializes dequantized operands; see BENCH_NOTES int8 study), so
# the bf16 roof applies — except W8A8, whose big matmuls run the int8 MXU
# (2x nominal / 415.8 measured TOPS): the roofline for the self-check is
# the int8 peak then.
V5E_PEAK_TFLOPS = 394.0 if QUANT == "w8a8" else 197.0


def _build_params(init_fn):
    """Init params; under BENCH_QUANT=int8, synthesize the QUANTIZED tree
    directly on the chip.  The unquantized bf16 7B tree OOMs a 16 GB v5e at
    init (measured), and init-on-host + quantize + 7 GB tunnel transfer
    takes >1 h on this 1-core host — but bench weights are synthetic either
    way and throughput doesn't depend on their values, so we eval_shape the
    init+quantize pipeline and fill it on-device: int8 leaves ~ U[-127,127],
    scales ~ the magnitude real quantization would produce, float leaves
    ~ N(0, 0.02).  Real serving quantizes real checkpoints at load
    (exp/base_exp.py:prepare_inference_params)."""
    import jax
    import jax.numpy as jnp

    if not QUANT:
        # serving dtype policy (exp/base_exp.py:prepare_inference_params):
        # big fp32 tensors -> bf16.  init_* leaves action heads fp32 (the
        # training-parity default); serving casts them, so the bench must
        # too — otherwise the DDIM chain times fp32 matmuls the product
        # never runs.
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim >= 2 else x,
            init_fn(),
        )
    assert QUANT in ("int8", "w8a8"), f"unknown BENCH_QUANT={QUANT!r}"
    if QUANT == "w8a8":
        from dexbotic_tpu.ops import quant_matmul

        quant_matmul.W8A8_MIN_ROWS = 2048  # batched prefill on the int8 MXU
    from dexbotic_tpu.ops.quant import quantize_params

    shapes = jax.eval_shape(lambda: quantize_params(init_fn(), in_place=False))
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 4096))

    def make(s):
        if s.dtype == jnp.int8:
            return jax.random.randint(next(keys), s.shape, -127, 128, dtype=jnp.int8)
        if s.ndim >= 2 and (s.shape[-2] == 1 or s.shape[-1] == 1):
            # scale leaves: [.., 1, out] (linear) or [V, 1] (embedding)
            return jnp.full(s.shape, 0.02 * 3 / 127, s.dtype)
        return (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.02).astype(s.dtype)

    return jax.tree.map(make, shapes)


def _qtag() -> str:
    return f"_{QUANT}" if QUANT else ""


def _fresh_params(params, r):
    """Quantized runs only: barrier the int8 params to the per-iteration rng
    so XLA does not hoist the int8->bf16 dequant converts out of the scan
    and materialize a full bf16 weight copy (OOM at 7b, and
    unrepresentative of per-request serving).  bf16 params pass through —
    their HBM reads happen inside every matmul regardless."""
    if not QUANT:
        return params, r
    import jax

    return jax.lax.optimization_barrier((params, r))


# ---------------------------------------------------------------------------
# Analytic FLOPs (matmul terms only) — used for the roofline self-check and
# the achieved-TFLOP/s report.  2*P*T for parameter matmuls (P excludes
# embedding lookups) + 4*T*KV*D_attn*L for attention score/AV products.
# Slight undercount (no norms/softmax) — conservative for the assert.
# ---------------------------------------------------------------------------


def _n_params(tree, exclude=()):
    import jax

    flat = {"/".join(str(k) for k in path): leaf.size
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}
    total = 0
    for name, size in flat.items():
        if any(e in name for e in exclude):
            continue
        total += size
    return total


def _attn_flops(tokens, kv_tokens, d_attn, layers):
    return 4.0 * tokens * kv_tokens * d_attn * layers


def _llm_nonembed(params_llm, cfg_llm):
    # tied embedding is a lookup at the input and unused as lm_head here
    p = _n_params(params_llm, exclude=("embed", "lm_head"))
    return p


# --- Baseline (derived, labeled): the reference publishes NO throughput or
# latency numbers (BASELINE.md, SURVEY.md §6), so `vs_baseline` divides by a
# FLOP-DERIVED BOUND on the reference's A100 serving rate for the SAME model
# and chunk FLOPs:  A100 dense-bf16 peak (312 TFLOP/s, NVIDIA A100 datasheet)
# x an assumed 25% serving MFU.  25% deliberately FAVORS the baseline —
# eager-torch VLA serving (sequential ViT -> prefill -> 10 separate DiT/Euler
# launches at batch 1-8, reference exp/*_exp.py) is dispatch-bound and
# single-digit-MFU in practice, while 25% is what well-tuned batched LLM
# inference reaches.  Every ratio printed against this bound is therefore a
# LOWER bound on the true speedup vs the reference's own stack.
A100_BF16_PEAK_TFLOPS = 312.0
BASELINE_ASSUMED_MFU = 0.25
BASELINE_KIND = "a100-bf16-peak-x25pct-mfu-flop-bound (derived; favors baseline)"


def derived_baseline_chunks_per_sec(flops_per_chunk: float) -> float:
    return A100_BF16_PEAK_TFLOPS * 1e12 * BASELINE_ASSUMED_MFU / flops_per_chunk


def check_and_report(metric, B, dt, flops_per_chunk):
    """Roofline self-check + single-line JSON report.

    dt: seconds per scan iteration (one chunk batch of B)."""
    chunks_per_sec = B / dt
    tflops = flops_per_chunk * chunks_per_sec / 1e12
    mfu = tflops / V5E_PEAK_TFLOPS
    assert tflops < V5E_PEAK_TFLOPS, (
        f"IMPOSSIBLE measurement: {chunks_per_sec:.1f} chunks/s x "
        f"{flops_per_chunk / 1e12:.3f} TFLOP/chunk implies {tflops:.0f} TFLOP/s "
        f"> v5e peak {V5E_PEAK_TFLOPS} — the timing scan is being hoisted; "
        f"refusing to print an inflated number."
    )
    baseline = derived_baseline_chunks_per_sec(flops_per_chunk)
    rec = {
        "metric": metric,
        "value": round(chunks_per_sec, 3),
        "unit": "chunks/s/chip",
        "vs_baseline": round(chunks_per_sec / baseline, 3),
        "baseline_chunks_per_sec": round(baseline, 2),
        "baseline_kind": BASELINE_KIND,
        "batch": B,
        "achieved_tflops": round(tflops, 1),
        "mfu": round(mfu, 3),
        "tflop_per_chunk": round(flops_per_chunk / 1e12, 3),
    }
    print(json.dumps(rec))
    return rec

# Default serving batch: 8 (the production micro-batching regime — the
# action server coalesces concurrent robot clients, exp/serve.py) except at
# 7b weight-only int8, where batching measures SLOWER than B=1 (XLA
# re-materializes the bf16 dequant per forward; BENCH_NOTES).  W8A8 fixes
# that — batched 7b prefill lands at M>=5k rows on the int8 MXU and B=8
# measures 21.4 chunks/s vs 17.1 at B=1 (round 4) — so w8a8 defaults to 8.
# The JSON line carries "batch"; override with BENCH_BATCH.
# BENCH_FUSED (the one-launch Pallas sampler) is the B=1 LATENCY lever —
# its dispatch only covers small batch, so it defaults the batch to 1.
DEFAULT_BATCH = "1" if (
    (SCALE == "7b" and QUANT != "w8a8") or os.environ.get("BENCH_FUSED", "")
) else "8"


def build(scale: str):
    from dexbotic_tpu.models.cogact import CogActConfig
    from dexbotic_tpu.models.vlm import VLMConfig
    from dexbotic_tpu.nn.transformer import TransformerConfig
    from dexbotic_tpu.nn.vit import ViTConfig, SIGLIP_SO400M_224, CLIP_VIT_L_336

    if scale == "test":
        llm = TransformerConfig(vocab_size=2048, hidden_size=256, num_layers=2,
                                num_heads=2, num_kv_heads=2, head_dim=128,
                                intermediate_size=512)
        vit = ViTConfig(image_size=112, patch_size=14, hidden_size=256, num_layers=2,
                        num_heads=4, intermediate_size=512, select_layer=None)
        dit = "DiT-S"
    elif scale == "05b":
        llm = TransformerConfig(vocab_size=32000, hidden_size=1536, num_layers=12,
                                num_heads=12, num_kv_heads=12, head_dim=128,
                                intermediate_size=4096)
        vit = SIGLIP_SO400M_224
        dit = "DiT-B"
    elif scale == "1b":
        llm = TransformerConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                                num_heads=16, num_kv_heads=16, head_dim=128,
                                intermediate_size=5504)
        vit = SIGLIP_SO400M_224
        dit = "DiT-B"
    elif scale == "2b":
        llm = TransformerConfig(vocab_size=32000, hidden_size=2560, num_layers=20,
                                num_heads=20, num_kv_heads=20, head_dim=128,
                                intermediate_size=6912)
        vit = SIGLIP_SO400M_224
        dit = "DiT-B"
    else:  # 7b — the DB-CogACT class (LLaVA-7B + CLIP-L-336 + DiT-B)
        from dexbotic_tpu.models.presets import LLAMA2_7B

        llm = LLAMA2_7B
        vit = CLIP_VIT_L_336
        dit = "DiT-B"

    return CogActConfig(
        vlm=VLMConfig(llm=llm, vit=vit, projector_type="mlp2x_gelu"),
        action_model_type=dit, action_dim=7, chunk_size=16,
    )


def build_pi0(scale: str):
    import dataclasses

    from dexbotic_tpu.models.flow_vla import pi0_config
    from dexbotic_tpu.models.presets import (
        GEMMA_2B, GEMMA_300M_EXPERT, SIGLIP_SO400M_224,
    )
    from dexbotic_tpu.nn.transformer import TransformerConfig
    from dexbotic_tpu.nn.vit import ViTConfig

    if scale == "test":
        llm = TransformerConfig(vocab_size=2048, hidden_size=256, num_layers=2,
                                num_heads=2, num_kv_heads=1, head_dim=128,
                                intermediate_size=512, act="gelu_tanh",
                                norm_offset=1.0, embed_scale=True)
        expert = dataclasses.replace(llm, hidden_size=128, intermediate_size=256,
                                     has_embed=False)
        vit = ViTConfig(image_size=112, patch_size=14, hidden_size=256, num_layers=2,
                        num_heads=4, intermediate_size=512, select_layer=None)
    elif scale in ("1b", "2b"):
        # PaliGemma-class but sized to fit one v5e chip comfortably;
        # MoT requires matching layer counts across streams
        n_layers = 12 if scale == "1b" else 18
        llm = dataclasses.replace(GEMMA_2B, vocab_size=32768, num_layers=n_layers)
        expert = dataclasses.replace(GEMMA_300M_EXPERT, num_layers=n_layers)
        vit = SIGLIP_SO400M_224
    else:  # full pi0 class
        llm = GEMMA_2B
        expert = GEMMA_300M_EXPERT
        vit = SIGLIP_SO400M_224
    return pi0_config(llm, expert, vit, action_dim=32, chunk_size=50,
                      projector_type="linear")


def _time_scan(f, *args, iters):
    """Compile, warm, and time f(*args, iters); returns sec/iteration.
    f must be a jitted scan whose LAST arg is the static iteration count
    and whose return is a scalar (the pull forces completion — axon's
    block_until_ready does not reliably block)."""
    float(f(*args, iters))  # warmup/compile
    t0 = time.perf_counter()
    float(f(*args, iters))
    return (time.perf_counter() - t0) / iters


def main_pi0():
    import jax
    import jax.numpy as jnp

    from dexbotic_tpu.models.flow_vla import flow_vla_inference_action, init_flow_vla

    cfg = build_pi0(SCALE)
    params = _build_params(lambda: init_flow_vla(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    B = int(os.environ.get("BENCH_BATCH", DEFAULT_BATCH))
    tmask = jnp.ones((B, 48), jnp.int32)
    size = cfg.vit.image_size
    imasks = jnp.ones((B, 3), jnp.int32)
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    def bench_n(params, rng, n):
        def body(carry, r):
            p, r = _fresh_params(params, r)
            k_i, k_m, k_s, k_n = jax.random.split(r, 4)
            # per-iteration inputs: nothing in the frame->chunk path is
            # loop-invariant, so nothing can hoist out of the timed scan
            ids = jax.random.randint(k_i, (B, 48), 1, 30000)
            imgs = jax.random.normal(k_m, (B, 3, size, size, 3), jnp.bfloat16)
            states = jax.random.normal(k_s, (B, cfg.action_dim), jnp.bfloat16)
            out = flow_vla_inference_action(
                p, cfg, ids, tmask, imgs, imasks, states, k_n
            )
            return carry + jnp.mean(out).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(rng, n))
        return acc

    f = jax.jit(bench_n, static_argnums=(2,))
    dt = _time_scan(f, params, jax.random.PRNGKey(3), iters=iters)

    # analytic FLOPs/chunk: 3 ViT views + MoT prefix prefill + num_flow_steps
    # Euler steps of the expert attending to the frozen prefix KV
    n_img_tok = (size // cfg.vit.patch_size) ** 2
    s_pre = 3 * n_img_tok + 48
    t_suf = cfg.chunk_size + 2  # state + time/cond + chunk tokens
    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"], cfg.llm)
    p_exp = _n_params(params["expert"])
    d_llm = cfg.llm.num_heads * cfg.llm.head_dim
    d_exp = cfg.expert.num_heads * cfg.expert.head_dim
    flops = B * (
        2.0 * p_vit * 3 * n_img_tok
        + 2.0 * p_llm * s_pre + _attn_flops(s_pre, s_pre, d_llm, cfg.llm.num_layers)
        + cfg.num_flow_steps * (
            2.0 * p_exp * t_suf
            + _attn_flops(t_suf, s_pre + t_suf, d_exp, cfg.expert.num_layers)
        )
    )
    check_and_report(f"pi0_{SCALE}{_qtag()}_action_chunks_per_sec_chip",
                     B, dt, flops / B)


def main_oft():
    """OFT-L1: single-forward action regression (no sampler chain) — the
    fastest serving policy class (reference model/oft/oft_arch.py)."""
    import jax
    import jax.numpy as jnp

    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.oft import OFTConfig, init_oft, oft_inference_action

    base = build(SCALE)
    cfg = OFTConfig(
        vlm=base.vlm, action_model_type="L1", action_dim=7, chunk_size=8,
    )
    params = _build_params(lambda: init_oft(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    B = int(os.environ.get("BENCH_BATCH", DEFAULT_BATCH))
    nt = cfg.vlm.num_image_tokens
    S = nt + 48
    valid = jnp.ones((B, S), jnp.int32)
    is_img = (jnp.arange(S) < nt)[None, :]
    size = cfg.vlm.vit.image_size
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    def bench_n(params, rng, n):
        def body(carry, r):
            p, r = _fresh_params(params, r)
            k_i, k_m, k_n = jax.random.split(r, 3)
            ids = jnp.where(is_img, IMAGE_TOKEN_INDEX,
                            jax.random.randint(k_i, (B, S), 1, 30000))
            imgs = jax.random.normal(k_m, (B, 1, size, size, 3), jnp.bfloat16)
            out = oft_inference_action(p, cfg, ids, valid, imgs, rng=k_n)
            return carry + jnp.mean(out).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(rng, n))
        return acc

    f = jax.jit(bench_n, static_argnums=(2,))
    dt = _time_scan(f, params, jax.random.PRNGKey(3), iters=iters)

    # analytic FLOPs/chunk: ViT + one LLM pass over prompt + action segment
    s = S + cfg.chunk_size + (1 if cfg.use_proprio else 0)
    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"], cfg.vlm.llm)
    d_llm = cfg.vlm.llm.num_heads * cfg.vlm.llm.head_dim
    flops = B * (
        2.0 * p_vit * nt
        + 2.0 * p_llm * s + _attn_flops(s, s, d_llm, cfg.vlm.llm.num_layers)
    )
    check_and_report(f"oft_l1_{SCALE}{_qtag()}_action_chunks_per_sec_chip",
                     B, dt, flops / B)


def main():
    import jax
    import jax.numpy as jnp

    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.cogact import cogact_inference_action, init_cogact

    cfg = build(SCALE)
    # BENCH_SAMPLER=dpm: DPM-Solver++(2M) at 5 steps (the documented
    # config for matching DDIM-10's trajectory error with half the serial
    # chain — ops/diffusion.py).  The analytic-FLOP roofline below keys
    # off cfg.ddim_steps, so the self-check adapts.
    if os.environ.get("BENCH_SAMPLER", "") == "dpm":
        import dataclasses

        cfg = dataclasses.replace(
            cfg, sampler="dpm",
            ddim_steps=int(os.environ.get("BENCH_STEPS", "5")))
    # BENCH_FUSED=1: whole sampling loop as one Pallas launch
    # (ops/dit_fused.py — the B=1 latency kernel).  BENCH_FUSED=int8
    # additionally quantizes ONLY the DiT head to int8, halving the
    # kernel's weight-stream bytes (dequant in-register; VLM stays bf16).
    FUSED = os.environ.get("BENCH_FUSED", "")
    if FUSED:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_sampler=True)
    # init directly in bf16 (a transient fp32 7B tree would not fit HBM)
    params = _build_params(lambda: init_cogact(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    if FUSED == "int8":
        from dexbotic_tpu.ops.quant import quantize_params

        params["action_head"] = jax.jit(
            lambda h: quantize_params(h, pad_cols=False)
        )(params["action_head"])

    nt = cfg.vlm.num_image_tokens
    text_len = 48
    B = int(os.environ.get("BENCH_BATCH", DEFAULT_BATCH))
    S = nt + text_len
    valid = jnp.ones((B, S), jnp.int32)
    is_img = (jnp.arange(S) < nt)[None, :]
    size = cfg.vlm.vit.image_size

    # Timing notes (axon tunnel): block_until_ready does not reliably wait
    # and per-dispatch RPCs are expensive, so the iteration loop lives ON
    # DEVICE as one lax.scan with per-step rng and a scalar carry; one
    # dispatch, one scalar pull.  params are ARGUMENTS (closing over them
    # bakes GBs of constants into the HLO and balloons compile time).
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    def bench_n(params, rng, n):
        def body(carry, r):
            p, r = _fresh_params(params, r)
            k_i, k_m, k_n = jax.random.split(r, 3)
            ids = jnp.where(is_img, IMAGE_TOKEN_INDEX,
                            jax.random.randint(k_i, (B, S), 1, 30000))
            imgs = jax.random.normal(k_m, (B, 1, size, size, 3), jnp.bfloat16)
            out = cogact_inference_action(p, cfg, ids, valid, imgs, k_n)
            return carry + jnp.mean(out).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(rng, n))
        return acc

    f = jax.jit(bench_n, static_argnums=(2,))
    dt = _time_scan(f, params, jax.random.PRNGKey(3), iters=iters)

    # analytic FLOPs/chunk: ViT + LLM prefill + ddim_steps x CFG-pair DiT
    s = S
    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"], cfg.vlm.llm)
    p_dit = _n_params(params["action_head"])
    d_llm = cfg.vlm.llm.num_heads * cfg.vlm.llm.head_dim
    t_dit = cfg.chunk_size + 1  # chunk + conditioning token
    cfg_mult = 2 if cfg.cfg_scale > 1.0 else 1
    flops = B * (
        2.0 * p_vit * nt
        + 2.0 * p_llm * s + _attn_flops(s, s, d_llm, cfg.vlm.llm.num_layers)
        + cfg.ddim_steps * cfg_mult * 2.0 * p_dit * t_dit
    )
    stag = f"_dpm{cfg.ddim_steps}" if cfg.sampler == "dpm" else ""
    # tag reflects the path that actually runs: the fused Pallas sampler is
    # default-on and self-dispatches (TPU backend, rows<=4)
    if (cfg.fused_sampler and B * cfg_mult <= 4
            and jax.default_backend() == "tpu"):
        stag += "_fused"
    if FUSED == "int8":
        stag += "_hint8"
    return check_and_report(
        f"cogact_{SCALE}{_qtag()}{stag}_action_chunks_per_sec_chip",
        B, dt, flops / B)


def main_latency():
    """p50/p95 frame->action latency through the REAL serving path: multipart
    HTTP POST -> decode -> preprocess -> template/tokenize -> jitted chunk ->
    denorm -> JSON.  Robot control is a latency product; this publishes the
    number a robot client actually sees (VERDICT r3 #5).  Note: this
    environment adds axon-tunnel RPC latency a colocated host would not pay;
    the device portion is the BENCH_BATCH=1 chunk time."""
    import io
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from dexbotic_tpu.exp import base_exp
    from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
    from dexbotic_tpu.exp.serve import CogActServer
    from dexbotic_tpu.models.cogact import init_cogact

    cfg = build(SCALE)
    params = _build_params(lambda: init_cogact(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    exp = CogActExp(
        model=CogActModelConfig(action_dim=cfg.action_dim, chunk_size=cfg.chunk_size),
        tokenizer=base_exp.TokenizerConfig(model_max_length=2048),
    )
    import dataclasses

    exp.data = dataclasses.replace(
        exp.data, image_processor=str(cfg.vlm.vit.image_size), aug_policy="identity"
    )
    norms = {"min": [-1.0] * cfg.action_dim, "max": [1.0] * cfg.action_dim}
    tokenizer = exp.tokenizer.build_tokenizer()
    srv = CogActServer(exp, cfg, params, tokenizer, norms, host="127.0.0.1", port=0)
    httpd = srv.serve_background()
    port = httpd.server_address[1]

    rs = np.random.RandomState(0)
    buf = io.BytesIO()
    Image.fromarray(rs.randint(0, 256, (480, 640, 3), np.uint8)).save(buf, "PNG")
    png = buf.getvalue()
    boundary = "XBX"
    parts = [
        (f'--{boundary}\r\nContent-Disposition: form-data; name="text"'
         "\r\n\r\npick up the moka pot\r\n").encode(),
        (f'--{boundary}\r\nContent-Disposition: form-data; name="image"; '
         f'filename="f.png"\r\nContent-Type: image/png\r\n\r\n').encode()
        + png + b"\r\n",
    ]
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/process_frame", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=1200) as r:
            r.read()

    for _ in range(5):  # compile + warm
        post()
    lat = []
    for _ in range(int(os.environ.get("BENCH_ITERS", "30"))):
        t0 = time.perf_counter()
        post()
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[int(len(lat) * 0.95)]
    httpd.shutdown()

    # derived A100 bound for the same chunk (device-only; host excluded)
    nt = cfg.vlm.num_image_tokens
    s = nt + 48
    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"], cfg.vlm.llm)
    p_dit = _n_params(params["action_head"])
    d_llm = cfg.vlm.llm.num_heads * cfg.vlm.llm.head_dim
    cfg_mult = 2 if cfg.cfg_scale > 1.0 else 1
    flops = (2.0 * p_vit * nt + 2.0 * p_llm * s
             + _attn_flops(s, s, d_llm, cfg.vlm.llm.num_layers)
             + cfg.ddim_steps * cfg_mult * 2.0 * p_dit * (cfg.chunk_size + 1))
    bound_ms = flops / (A100_BF16_PEAK_TFLOPS * 1e12 * BASELINE_ASSUMED_MFU) * 1e3
    print(json.dumps({
        "metric": f"cogact_{SCALE}{_qtag()}_p50_frame_to_action_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(bound_ms / p50, 3),
        "baseline_ms_device_bound": round(bound_ms, 2),
        "baseline_kind": BASELINE_KIND,
        "p95_ms": round(p95, 2),
        "n": len(lat),
        "note": "full HTTP serving path incl. host preprocess + axon-tunnel RPC",
    }))


def main_default_suite():
    """Driver default (bare `python bench.py`, no BENCH_* overrides): publish
    the full default picture in one run —
      * bf16 B=8 (the product micro-batching default),
      * the default-on fused-sampler B=1 latency point (ops/dit_fused.py),
      * the gate-cited W8A8 batched row (the >=2x-vs-A100-bound config;
        promotion policy in BENCH_NOTES "W8A8 promotion gate").
    Each config runs as its own subprocess so the TPU has exactly one owner
    at a time (compile caches don't hit across processes here regardless);
    a sub-failure degrades to the rows that did measure.  The LAST printed
    line is the headline record and embeds the other rows."""
    import subprocess
    import sys

    def subrun(env_extra, timeout=3000):
        env = dict(os.environ, BENCH_SUBRUN="1", **env_extra)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout)
            for line in reversed(out.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                    print(line)
                    return rec
                except (json.JSONDecodeError, ValueError):
                    continue
            print(f"# subrun {env_extra} produced no JSON (rc={out.returncode}): "
                  f"{out.stderr.strip().splitlines()[-1] if out.stderr.strip() else ''}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — degrade, never kill the headline
            print(f"# subrun {env_extra} failed: {e}", file=sys.stderr)
        return None

    rec_bf16 = subrun({})                        # bf16 B=8 (product default)
    rec_b1 = subrun({"BENCH_BATCH": "1"})        # fused sampler B=1 (default-on)
    rec_w8 = subrun({"BENCH_QUANT": "w8a8"})     # gated W8A8 batched row

    GATE = ("tests/test_quant.py W8A8 promotion gate (passing): int8 "
            "activations forced onto EVERY matmul — CogACT/OFT-L1 action "
            "cos>0.98, OFT-Discrete bins bit-exact, pi0 trajectory "
            "rel-L2<5%; full default flip awaits real-checkpoint replay "
            "(BENCH_NOTES 'W8A8 promotion gate')")
    brief = lambda r: {k: r[k] for k in  # noqa: E731
                       ("metric", "value", "vs_baseline", "mfu", "batch") if k in r}
    if rec_w8 is not None:
        head = dict(rec_w8)
        head["gate"] = GATE
        head["note"] = ("headline = gate-passing W8A8 batched serving; "
                        "bf16 product default + fused-B=1 rows embedded")
        if rec_bf16 is not None:
            head["bf16_b8"] = brief(rec_bf16)
    elif rec_bf16 is not None:
        head = dict(rec_bf16)
    else:
        print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "",
                          "vs_baseline": 0}))
        return
    if rec_b1 is not None:
        head["b1_fused"] = brief(rec_b1)
    print(json.dumps(head))


if __name__ == "__main__":
    _model = os.environ.get("BENCH_MODEL", "cogact")
    # BENCH_SCALE/BENCH_ITERS parameterize the suite rather than disable it
    _overridden = any(os.environ.get(k) for k in (
        "BENCH_QUANT", "BENCH_BATCH", "BENCH_FUSED", "BENCH_SAMPLER",
        "BENCH_SUBRUN", "BENCH_STEPS"))
    if _model == "pi0":
        main_pi0()
    elif _model == "oft":
        main_oft()
    elif _model == "latency":
        main_latency()
    elif not _overridden:
        main_default_suite()
    else:
        main()
