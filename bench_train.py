"""Training-throughput benchmark v2 on the real TPU chip (VERDICT r4 #1).

Measures fused fine-tune steps (forward + backward + AdamW, bf16 params,
remat) for FIVE policy classes — CogACT (full 0.5b + frozen-LLM 1b), pi0,
OFT-L1, MemVLA, NaVILA packed-4k — in samples/sec/chip WITH an analytic
FLOP roofline and MFU, the same discipline bench.py applies to serving:

* every data-carrying input (ids, images, actions, states) is REGENERATED
  on device from the per-step rng INSIDE the jitted step — nothing is a
  baked HLO constant, nothing can be hoisted;
* train FLOPs are derived from the config (matmul terms only, an
  UNDERCOUNT: no norms/softmax, remat recompute excluded), so the implied
  TFLOP/s is a lower bound on executed compute; we ASSERT it is below the
  chip's bf16 peak before printing;
* `vs_baseline` divides by a FLOP-DERIVED BOUND on an A100 training the
  same model: A100 bf16 peak (312 TFLOP/s) x an assumed 40% training MFU
  — deliberately generous to the baseline (well-tuned dense-LLM training
  reaches 40-50%; the reference's HF-Trainer+DeepSpeed VLA fine-tune with
  64-worker host decode and non-reentrant grad ckpt is typically below) —
  so every ratio is a LOWER bound on the speedup vs the reference's own
  stack (/root/reference/dexbotic/exp/trainer.py:88-124).

Timing (axon tunnel): a lax.scan over steps would double-buffer the
(params, opt_state) carry — 2x state HBM, impossible at 1b — so steps run
as chained DONATED dispatches (each consumes the previous buffers in
place) and one scalar pull at the end synchronizes; dispatch RPCs are
cheap next to 100ms-scale steps.

Backward FLOP model per component (matmul terms): fwd = F, activation
backward dL/dx = F, weight gradients dL/dW = F — so a fully-trained
component costs 3F, a frozen component on the backprop path costs 2F
(dL/dx still flows through it to reach trained params below), and a
frozen component with nothing trained below it costs 1F (forward only).

Bare `python bench_train.py` runs the full table as sequential
subprocesses (one TPU owner at a time) and writes BENCH_TRAIN_OUT
(default BENCH_TRAIN_r05.json); BENCH_TRAIN_MODEL=<row> runs one row and
prints its JSON line.
"""

from __future__ import annotations

import json
import os
import time

V5E_PEAK_TFLOPS = 197.0
A100_BF16_PEAK_TFLOPS = 312.0
BASELINE_ASSUMED_TRAIN_MFU = 0.40
BASELINE_KIND = ("a100-bf16-peak-x40pct-train-mfu-flop-bound "
                 "(derived; favors baseline)")

# pi0-1b FULL AdamW is the 8-chip fsdp regime (measured: 19.4 G HBM at
# B=2 vs 15.75 G on one v5e) — the single-chip row freezes the VLM stream
# (expert + projector + action/state/time projections train)
ROWS = ("cogact_05b_full", "cogact_1b_freeze", "pi0_1b_freeze",
        "oft_l1_1b_freeze", "memvla_1b_freeze", "navila_pack4k_freeze")

# remat policy for the measured step: "full" (per-layer recompute, memory-
# tightest), "dots" (jax dots_saveable: keep matmul outputs, recompute only
# the elementwise chain -- recovers most recompute FLOPs when the model
# fits), or "none".  Measured study in BENCH_NOTES round 5.
REMAT = {"full": True, "dots": "dots", "none": False}[
    os.environ.get("BENCH_TRAIN_REMAT", "full")]


def _n_params(tree):
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def _llm_nonembed(params_llm):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params_llm)[0]
    return sum(
        leaf.size for path, leaf in flat
        if not any("embed" in str(k) or "lm_head" in str(k) for k in path)
    )


def _attn_flops(tokens, kv_tokens, d_attn, layers):
    return 4.0 * tokens * kv_tokens * d_attn * layers


def report(metric, B, dt, train_flops_per_sample, extra=None):
    samples_per_sec = B / dt
    tflops = train_flops_per_sample * samples_per_sec / 1e12
    mfu = tflops / V5E_PEAK_TFLOPS
    assert tflops < V5E_PEAK_TFLOPS, (
        f"IMPOSSIBLE: {samples_per_sec:.2f} samples/s x "
        f"{train_flops_per_sample/1e12:.3f} TFLOP/sample implies "
        f"{tflops:.0f} TFLOP/s > v5e peak {V5E_PEAK_TFLOPS} — refusing to "
        f"print an inflated number."
    )
    baseline = (A100_BF16_PEAK_TFLOPS * 1e12 * BASELINE_ASSUMED_TRAIN_MFU
                / train_flops_per_sample)
    rec = {
        "metric": metric,
        "value": round(samples_per_sec, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec / baseline, 3),
        "baseline_samples_per_sec": round(baseline, 2),
        "baseline_kind": BASELINE_KIND,
        "batch": B,
        "step_ms": round(dt * 1e3, 1),
        "achieved_tflops": round(tflops, 1),
        "mfu": round(mfu, 3),
        "tflop_per_sample": round(train_flops_per_sample / 1e12, 3),
        "remat": os.environ.get("BENCH_TRAIN_REMAT", "full"),
        **(extra or {}),
    }
    print(json.dumps(rec))
    return rec


def _optimizer(params, freeze: str):
    import jax.numpy as jnp
    import optax

    if freeze:
        # product freeze path: frozen subtrees get set_to_zero, NO moments
        # allocated — what makes 1b-class AdamW fit one 16 GB chip
        from dexbotic_tpu.exp.optim import OptimizerConfig, build_optimizer

        ocfg = OptimizerConfig(
            learning_rate=1e-5,
            freeze_llm="llm" in freeze,
            freeze_mm_vision="vision" in freeze or "llm" in freeze,
            lr_scheduler_type="constant", warmup_ratio=0.0,
        )
        return build_optimizer(ocfg, params, total_steps=1000)
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-5, mu_dtype=jnp.bfloat16),
    )


def _sg(p, freeze):
    """Cut the frozen tower's backward graph (see optim.stopgrad_subtrees
    docstring: the optimizer mask alone cannot free its stashed
    activations — the packed-NaVILA frozen step OOMed at 26.7 G without
    this)."""
    if not freeze:
        return p
    from dexbotic_tpu.exp.optim import stopgrad_subtrees

    return stopgrad_subtrees(p, ("vit", "mm_vision", "obs_vit"))


def _time_steps(step, params, opt_state, iters):
    import jax

    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(3))
    float(loss)  # compile + settle
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(10 + i))
    float(loss)  # the one synchronizing pull
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# Rows
# ---------------------------------------------------------------------------


def row_cogact(scale: str, freeze: str, B: int, iters: int):
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.cogact import cogact_loss, init_cogact

    cfg = build(scale)
    params = init_cogact(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = _optimizer(params, freeze)
    opt_state = tx.init(params)

    nt, size = cfg.vlm.num_image_tokens, cfg.vlm.vit.image_size
    S = nt + 48
    is_img = (jnp.arange(S) < nt)[None, :]
    valid = jnp.ones((B, S), bool)

    def one_step(params, opt_state, rng):
        k_i, k_m, k_a, k_d = jax.random.split(rng, 4)
        batch = {
            "input_ids": jnp.where(
                is_img, IMAGE_TOKEN_INDEX,
                jax.random.randint(k_i, (B, S), 1, 30000)),
            "attention_mask": valid,
            "images": jax.random.normal(k_m, (B, 1, size, size, 3), jnp.bfloat16),
            "actions": jnp.tanh(
                jax.random.normal(k_a, (B, cfg.chunk_size, cfg.action_dim))),
        }

        def lf(p):
            loss, _ = cogact_loss(_sg(p, freeze), cfg, batch, k_d, remat=REMAT)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(one_step, donate_argnums=(0, 1))
    dt = _time_steps(step, params, opt_state, iters)

    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"])
    p_proj = _n_params(params["vlm"]["projector"])
    p_dit = _n_params(params["action_head"])
    d_llm = cfg.vlm.llm.num_heads * cfg.vlm.llm.head_dim
    f_vit = 2.0 * p_vit * nt
    f_llm = 2.0 * p_llm * S + _attn_flops(S, S, d_llm, cfg.vlm.llm.num_layers)
    f_proj = 2.0 * p_proj * nt
    f_dit = cfg.repeated_diffusion_steps * 2.0 * p_dit * (cfg.chunk_size + 1)
    if freeze:
        # projector + DiT trained; dL/dx flows through the frozen LLM to
        # reach the projector; the frozen ViT gets forward only
        flops = (1 * f_vit) + (2 * f_llm) + (3 * f_proj) + (3 * f_dit)
    else:
        flops = 3 * (f_vit + f_llm + f_proj + f_dit)
    tag = f"cogact_{scale}" + (f"_{freeze}_frozen" if freeze else "_full")
    return report(f"{tag}_train_samples_per_sec_chip", B, dt, flops,
                  {"params_m": round(_n_params(params) / 1e6, 1)})


def row_pi0(scale: str, freeze: str, B: int, iters: int):
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_pi0
    from dexbotic_tpu.models.flow_vla import flow_vla_loss, init_flow_vla

    cfg = build_pi0(scale)
    params = init_flow_vla(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = _optimizer(params, freeze)
    opt_state = tx.init(params)

    size = cfg.vit.image_size
    text_len = 48
    tmask = jnp.ones((B, text_len), jnp.int32)
    imasks = jnp.ones((B, 3), jnp.int32)

    def one_step(params, opt_state, rng):
        k_i, k_m, k_s, k_a, k_d = jax.random.split(rng, 5)
        batch = {
            "input_ids": jax.random.randint(k_i, (B, text_len), 1, 30000),
            "attention_mask": tmask,
            "images": jax.random.normal(k_m, (B, 3, size, size, 3), jnp.bfloat16),
            "image_masks": imasks,
            "states": jax.random.normal(k_s, (B, cfg.action_dim)),
            "actions": jnp.tanh(
                jax.random.normal(k_a, (B, cfg.chunk_size, cfg.action_dim))),
        }

        def lf(p):
            loss, _ = flow_vla_loss(_sg(p, freeze), cfg, batch, k_d, remat=REMAT)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(one_step, donate_argnums=(0, 1))
    dt = _time_steps(step, params, opt_state, iters)

    n_img_tok = (size // cfg.vit.patch_size) ** 2
    s_pre = 3 * n_img_tok + text_len
    t_suf = cfg.chunk_size + 2
    T = s_pre + t_suf
    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"])
    p_exp = _n_params(params["expert"])
    d_exp = cfg.expert.num_heads * cfg.expert.head_dim
    p_proj = _n_params(params["vlm"]["projector"])
    # joint MoT attention: undercount with the (smaller) expert head width
    f_vit = 2.0 * p_vit * 3 * n_img_tok
    f_llm = (2.0 * p_llm * s_pre
             + _attn_flops(T, T, d_exp, cfg.expert.num_layers))
    f_proj = 2.0 * p_proj * 3 * n_img_tok
    f_exp = 2.0 * p_exp * t_suf
    if freeze:
        # frozen tower fwd-only; frozen LLM stream still carries dL/dx back
        # to the trainable projector; expert + projector fully trained
        flops = 1 * f_vit + 2 * f_llm + 3 * f_proj + 3 * f_exp
    else:
        flops = 3 * (f_vit + f_llm + f_proj + f_exp)
    tag = f"pi0_{scale}" + (f"_{freeze}_frozen" if freeze else "_full")
    return report(f"{tag}_train_samples_per_sec_chip", B, dt, flops,
                  {"params_m": round(_n_params(params) / 1e6, 1)})


def row_oft(scale: str, freeze: str, B: int, iters: int):
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.oft import OFTConfig, init_oft, oft_loss

    base = build(scale)
    cfg = OFTConfig(vlm=base.vlm, action_model_type="L1", action_dim=7,
                    chunk_size=8)
    params = init_oft(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = _optimizer(params, freeze)
    opt_state = tx.init(params)

    nt, size = cfg.vlm.num_image_tokens, cfg.vlm.vit.image_size
    S = nt + 48
    is_img = (jnp.arange(S) < nt)[None, :]
    valid = jnp.ones((B, S), bool)

    def one_step(params, opt_state, rng):
        k_i, k_m, k_a, k_d = jax.random.split(rng, 4)
        batch = {
            "input_ids": jnp.where(
                is_img, IMAGE_TOKEN_INDEX,
                jax.random.randint(k_i, (B, S), 1, 30000)),
            "attention_mask": valid,
            "images": jax.random.normal(k_m, (B, 1, size, size, 3), jnp.bfloat16),
            "actions": jnp.tanh(
                jax.random.normal(k_a, (B, cfg.chunk_size, cfg.action_dim))),
        }

        def lf(p):
            loss, _ = oft_loss(_sg(p, freeze), cfg, batch, k_d, remat=REMAT)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(one_step, donate_argnums=(0, 1))
    dt = _time_steps(step, params, opt_state, iters)

    s = S + cfg.chunk_size
    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"])
    p_head = _n_params(params["action_head"])
    d_llm = cfg.vlm.llm.num_heads * cfg.vlm.llm.head_dim
    f_vit = 2.0 * p_vit * nt
    f_llm = 2.0 * p_llm * s + _attn_flops(s, s, d_llm, cfg.vlm.llm.num_layers)
    f_head = 2.0 * p_head * cfg.chunk_size
    if freeze:
        flops = 1 * f_vit + 2 * f_llm + 3 * f_head
    else:
        flops = 3 * (f_vit + f_llm + f_head)
    tag = f"oft_l1_{scale}" + (f"_{freeze}_frozen" if freeze else "_full")
    return report(f"{tag}_train_samples_per_sec_chip", B, dt, flops,
                  {"params_m": round(_n_params(params) / 1e6, 1)})


def row_memvla(scale: str, freeze: str, B: int, iters: int):
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.memvla import (
        MemVLAConfig, init_mem_state, init_memvla, memvla_loss,
    )

    base = build(scale)
    cfg = MemVLAConfig(
        vlm=base.vlm, action_model_type=base.action_model_type,
        action_dim=7, chunk_size=16, per_token_size=64, mem_length=16,
    )
    params = init_memvla(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = _optimizer(params, freeze)
    opt_state = tx.init(params)
    state0 = init_mem_state(cfg, B)

    nt, size = cfg.vlm.num_image_tokens, cfg.vlm.vit.image_size
    S = nt + 48
    is_img = (jnp.arange(S) < nt)[None, :]
    valid = jnp.ones((B, S), bool)

    def one_step(params, opt_state, rng):
        k_i, k_m, k_a, k_t, k_d = jax.random.split(rng, 5)
        batch = {
            "input_ids": jnp.where(
                is_img, IMAGE_TOKEN_INDEX,
                jax.random.randint(k_i, (B, S), 1, 30000)),
            "attention_mask": valid,
            "images": jax.random.normal(k_m, (B, 1, size, size, 3), jnp.bfloat16),
            "actions": jnp.tanh(
                jax.random.normal(k_a, (B, cfg.chunk_size, cfg.action_dim))),
            "timesteps": jax.random.uniform(k_t, (B,)) * 16.0,
        }

        def lf(p):
            loss, _, _ = memvla_loss(_sg(p, freeze), cfg, batch, state0, k_d)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(one_step, donate_argnums=(0, 1))
    dt = _time_steps(step, params, opt_state, iters)

    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"])
    p_head = _n_params(params["action_head"])  # DiT + mem cross-attn
    p_mem = _n_params({k: v for k, v in params.items()
                       if k not in ("vlm", "action_head")})
    d_llm = cfg.vlm.llm.num_heads * cfg.vlm.llm.head_dim
    f_vit = 2.0 * p_vit * nt
    f_llm = 2.0 * p_llm * S + _attn_flops(S, S, d_llm, cfg.vlm.llm.num_layers)
    f_head = cfg.repeated_diffusion_steps * 2.0 * p_head * (cfg.chunk_size + 1)
    f_mem = 2.0 * p_mem * (cfg.num_per_tokens + 1)
    if freeze:
        flops = 1 * f_vit + 2 * f_llm + 3 * (f_head + f_mem)
    else:
        flops = 3 * (f_vit + f_llm + f_head + f_mem)
    tag = f"memvla_{scale}" + (f"_{freeze}_frozen" if freeze else "_full")
    return report(f"{tag}_train_samples_per_sec_chip", B, dt, flops,
                  {"params_m": round(_n_params(params) / 1e6, 1)})


def row_navila(scale: str, freeze: str, B_rows: int, iters: int,
               max_len: int = 4096, n_frames: int = 8, K: int = 4):
    """Packed NaVILA step: K original video samples packed into B_rows
    rows of max_len tokens (the reference's repack_multimodal_data regime,
    navila_arch.py:256-360).  samples/s counts the K ORIGINAL samples."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import build
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.navila import (
        NaVILAConfig, init_navila, navila_packed_loss, pack_batch,
    )

    base = build(scale)
    cfg = NaVILAConfig(vlm=base.vlm, num_video_frames=n_frames)
    params = init_navila(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = _optimizer(params, freeze)
    opt_state = tx.init(params)

    nt, size = cfg.vlm.num_image_tokens, cfg.vlm.vit.image_size
    # synthesize K ragged samples, each with n_frames image-tag blocks
    rs = np.random.RandomState(0)
    per_sample = n_frames * nt + 256
    ids = np.full((K, per_sample), 17, np.int64)
    for k in range(K):
        for f in range(n_frames):
            ids[k, f * (nt + 24):f * (nt + 24) + nt] = IMAGE_TOKEN_INDEX
    labels = rs.randint(1, 30000, ids.shape)
    valid = np.ones(ids.shape, bool)
    valid[1:, -64:] = False  # ragged tails so packing is non-trivial
    packed = pack_batch(ids, labels, valid, num_rows=B_rows, max_len=max_len)
    packed = {k: jnp.asarray(v) for k, v in packed.items()}

    def one_step(params, opt_state, rng):
        k_m, k_i = jax.random.split(rng)
        batch = dict(
            packed,
            images=jax.random.normal(
                k_m, (K, n_frames, size, size, 3), jnp.bfloat16),
            # regenerate non-image token ids in place (structure arrays —
            # positions/segments/img_index — stay; data can't hoist)
            input_ids=jnp.where(
                packed["input_ids"] == IMAGE_TOKEN_INDEX,
                packed["input_ids"],
                jax.random.randint(k_i, packed["input_ids"].shape, 1, 30000)),
        )

        def lf(p):
            loss, _ = navila_packed_loss(_sg(p, freeze), cfg, batch, remat=REMAT)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(one_step, donate_argnums=(0, 1))
    dt = _time_steps(step, params, opt_state, iters)

    p_vit = _n_params(params["vlm"]["vit"])
    p_llm = _llm_nonembed(params["vlm"]["llm"])
    d_llm = cfg.vlm.llm.num_heads * cfg.vlm.llm.head_dim
    seg_len = per_sample  # attention is segment-masked: count per segment
    f_vit = 2.0 * p_vit * (K * n_frames * nt) / K
    f_llm = (2.0 * p_llm * B_rows * max_len
             + K * _attn_flops(seg_len, seg_len, d_llm, cfg.vlm.llm.num_layers)) / K
    flops = (1 * f_vit + 2 * f_llm) if freeze else 3 * (f_vit + f_llm)
    tag = f"navila_{scale}_pack{max_len}" + (f"_{freeze}_frozen" if freeze else "_full")
    return report(f"{tag}_train_samples_per_sec_chip", K, dt, flops,
                  {"params_m": round(_n_params(params) / 1e6, 1),
                   "packed_rows": B_rows, "pack_len": max_len})


def run_row(row: str):
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    B = os.environ.get("BENCH_BATCH")
    if row == "cogact_05b_full":
        return row_cogact("05b", "", int(B or 8), iters)
    if row == "cogact_1b_freeze":
        return row_cogact("1b", "llm", int(B or 8), iters)
    if row == "pi0_1b_freeze":
        return row_pi0("1b", "llm", int(B or 4), iters)
    if row == "pi0_1b_full":
        return row_pi0("1b", "", int(B or 2), iters)
    if row == "oft_l1_1b_freeze":
        return row_oft("1b", "llm", int(B or 4), iters)
    if row == "memvla_1b_freeze":
        return row_memvla("1b", "llm", int(B or 4), iters)
    if row == "navila_pack4k_freeze":
        return row_navila("05b", "llm", int(B or 2), iters)
    # free-form: model_scale_freezespec, e.g. BENCH_TRAIN_MODEL=cogact_test_full
    parts = row.split("_")
    fn = {"cogact": row_cogact, "pi0": row_pi0, "oft": row_oft,
          "memvla": row_memvla, "navila": row_navila}[parts[0]]
    scale = parts[1] if len(parts) > 1 else "test"
    freeze = "" if (len(parts) < 3 or parts[2] == "full") else "llm"
    return fn(scale, freeze, int(B or 4), iters)


def main_suite():
    import subprocess
    import sys

    out_path = os.environ.get("BENCH_TRAIN_OUT", "BENCH_TRAIN_r05.json")
    rows = os.environ.get("BENCH_TRAIN_ROWS", ",".join(ROWS)).split(",")
    records = []
    for row in rows:
        env = dict(os.environ, BENCH_TRAIN_MODEL=row)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=3600)
            rec = None
            for line in reversed(p.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                    break
                except (json.JSONDecodeError, ValueError):
                    continue
            if rec is None:
                lines = p.stderr.strip().splitlines() or ["<no stderr>"]
                # prefer the actual failure line over jax's traceback-
                # filtering notice (which is often last)
                informative = [ln for ln in lines if any(
                    s in ln for s in ("Error", "EXHAUSTED", "Exception",
                                      "error:", "Aborted"))
                    and "internal frames" not in ln]
                err = (informative or lines)[-1]
                rec = {"metric": row, "error": err[-300:], "rc": p.returncode}
            records.append(rec)
            print(json.dumps(rec), flush=True)
        except subprocess.TimeoutExpired:
            records.append({"metric": row, "error": "timeout"})
    with open(out_path, "w") as f:
        json.dump({"rows": records, "peak_tflops": V5E_PEAK_TFLOPS,
                   "baseline_kind": BASELINE_KIND}, f, indent=2)
    ok = [r for r in records if "value" in r]
    summary = {
        "metric": "train_suite_samples_per_sec_geomean_vs_baseline",
        "value": round(
            (lambda v: (
                1.0 if not v else float(__import__("math").exp(
                    sum(__import__("math").log(max(x, 1e-9)) for x in v) / len(v)
                ))
            ))([r["vs_baseline"] for r in ok]), 3),
        "unit": "x",
        "vs_baseline": 0,
        "rows_measured": len(ok),
        "rows_total": len(rows),
        "out": out_path,
    }
    summary["vs_baseline"] = summary["value"]
    print(json.dumps(summary))


if __name__ == "__main__":
    row = os.environ.get("BENCH_TRAIN_MODEL", "")
    if row:
        run_row(row)
    else:
        main_suite()
