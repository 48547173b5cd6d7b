"""Attention kernel microbench on the real TPU: XLA vs Pallas paths.

Loop-VARIANT timing (per-iteration keyed input perturbation inside one
lax.scan program — plain repeated calls of identical args let XLA hoist the
whole op out of the loop and the numbers become fiction; see BENCH_NOTES
round-2 methodology note).  One scalar pull at the end synchronizes.

Modes:
    python script/bench_attention.py                 # forward table
    python script/bench_attention.py --grad          # forward+backward table
    python script/bench_attention.py --sweep-bwd     # bwd block-size sweep @4k
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.ops.attention import attention_xla, flash_attention


def make_inputs(B, S, Hq, Hkv, D=128):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, Hq, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.bfloat16)
    valid = jnp.ones((B, S), jnp.int32)
    grp = jnp.broadcast_to(jnp.arange(1, S + 1, dtype=jnp.int32), (B, S))
    return q, k, v, grp, valid


def bench(fn, q, k, v, grp, valid, grad=False, iters=30):
    def call(qq):
        out = fn(qq, k, v, grp, grp, valid)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def body(c, r):
        eps = jax.random.uniform(r, (), jnp.float32, 0.0, 1e-6).astype(q.dtype)
        if grad:
            val, dq = jax.value_and_grad(call)(q + eps)
            return c + val + jnp.sum(dq.astype(jnp.float32)) * 1e-30, None
        return c + call(q + eps), None

    f = jax.jit(lambda rng: jax.lax.scan(
        body, jnp.float32(0), jax.random.split(rng, iters))[0])
    r = f(jax.random.PRNGKey(9))
    r.block_until_ready()
    t0 = time.perf_counter()
    total = float(f(jax.random.PRNGKey(10)))
    assert np.isfinite(total)
    return (time.perf_counter() - t0) / iters * 1e3


SHAPES = [
    (1, 320, 16, 16), (1, 512, 16, 16), (1, 640, 32, 32),
    (8, 640, 16, 16), (1, 816, 8, 1), (1, 2048, 16, 8), (1, 4096, 16, 16),
]


def main_table(grad: bool):
    label = "fwd+bwd" if grad else "fwd"
    print(f"{'shape':>24} | {'XLA':>9} | {'pallas':>9} | ratio  ({label})")
    for B, S, Hq, Hkv in SHAPES:
        q, k, v, grp, valid = make_inputs(B, S, Hq, Hkv)
        t_x = bench(attention_xla, q, k, v, grp, valid, grad=grad)
        t_p = bench(flash_attention, q, k, v, grp, valid, grad=grad)
        print(f"B{B} S{S} H{Hq}/{Hkv} | {t_x:8.3f}ms | {t_p:8.3f}ms | {t_x/t_p:4.2f}x",
              flush=True)


def main_sweep_bwd():
    B, S, Hq, Hkv = 1, 4096, 16, 16
    q, k, v, grp, valid = make_inputs(B, S, Hq, Hkv)
    print(f"bwd block sweep @ B{B} S{S} H{Hq} (fwd+bwd ms):")
    for bq, bk in ((128, 512), (256, 256), (256, 512), (256, 1024),
                   (512, 512), (512, 1024)):
        fn = lambda *a: flash_attention(*a, block_q=bq, block_kv=bk)  # noqa: E731
        t = bench(fn, q, k, v, grp, valid, grad=True)
        print(f"  block_q={bq:4d} block_kv={bk:4d}: {t:8.3f} ms", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--sweep-bwd", action="store_true")
    args = ap.parse_args()
    if args.sweep_bwd:
        main_sweep_bwd()
    else:
        main_table(args.grad)
