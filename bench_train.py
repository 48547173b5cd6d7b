"""Training-throughput benchmark on the real TPU chip.

Measures the fused CogACT fine-tune step (ViT + LLM + 4x-repeated diffusion
loss, backward, AdamW) in samples/sec/chip.  Timing follows bench.py's
tunnel-safe method: N steps as data-dependent jitted calls would still pay
per-dispatch RPC; instead the step loop lives on device via lax.scan over
pre-staged batches.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

SCALE = os.environ.get("BENCH_SCALE", "05b")
# Estimated reference training throughput (torch+DeepSpeed, A100, same class):
# ~8 samples/s/GPU for 1b-class VLA fine-tuning with grad ckpt.
# NOTE: 1b-class training with AdamW does not fit one 16GB v5e chip (that is
# the fsdp-over-8-chips regime); single-chip train bench uses 05b by default.
BASELINE_SAMPLES_PER_SEC = {"test": 100.0, "05b": 14.0, "1b": 8.0, "2b": 5.0}


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.cogact import cogact_loss, init_cogact

    cfg = build(SCALE)
    params = init_cogact(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    freeze = os.environ.get("BENCH_FREEZE", "")
    if freeze:
        # adapter-style fine-tune through the product freeze path: frozen
        # subtrees get set_to_zero (NO moments allocated), which is what
        # makes 1b-class training fit one 16GB chip (exp/optim.py)
        from dexbotic_tpu.exp.optim import OptimizerConfig, build_optimizer

        ocfg = OptimizerConfig(
            learning_rate=1e-5,
            freeze_llm="llm" in freeze,
            freeze_mm_vision="vision" in freeze or "llm" in freeze,
            lr_scheduler_type="constant",
            warmup_ratio=0.0,
        )
        tx = build_optimizer(ocfg, params, total_steps=1000)
    else:
        # bf16 moments: the on-device scan double-buffers the carry, so fp32
        # AdamW state (2x7.3GB transient for 0.9B) cannot fit one 16GB chip
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(1e-5, mu_dtype=jnp.bfloat16),
        )
    opt_state = tx.init(params)

    B = int(os.environ.get("BENCH_BATCH", "8"))
    nt = cfg.vlm.num_image_tokens
    ids = np.random.RandomState(0).randint(1, 30000, (B, nt + 48))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    size = cfg.vlm.vit.image_size
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones(ids.shape, bool),
        "images": jax.random.normal(jax.random.PRNGKey(1), (B, 1, size, size, 3), jnp.bfloat16),
        "actions": jnp.tanh(jax.random.normal(jax.random.PRNGKey(2), (B, cfg.chunk_size, 7))),
    }

    # A scan over steps would double-buffer the (params, opt_state) carry —
    # too much HBM at 1b.  Instead: chained DONATED step dispatches (each
    # consumes the previous buffers in place) with one scalar pull at the
    # end; dispatch RPCs are cheap, only the final pull synchronizes.
    def one_step(params, opt_state, rng):
        def lf(p):
            loss, _ = cogact_loss(p, cfg, batch, rng, remat=True)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(one_step, donate_argnums=(0, 1))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(3))
    float(loss)  # compile + settle
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(10 + i))
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    samples_per_sec = B / dt

    baseline = BASELINE_SAMPLES_PER_SEC.get(SCALE, 8.0)
    tag = f"_{freeze}_frozen" if freeze else ""
    print(
        json.dumps(
            {
                "metric": f"cogact_{SCALE}{tag}_train_samples_per_sec_chip",
                "value": round(samples_per_sec, 3),
                "unit": "samples/s/chip",
                "vs_baseline": round(samples_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
