"""W8A8 regime probe at REAL batched-prefill shapes (round 3).

The round-2 study closed W8A8 for B=1 (M=624 stalls at ~40-50 T(FL)OPS for
bf16 and int8 alike).  Batched serving changes the regime: at 1b B=8 the
prefill matmuls run M=8*304=2432 activation rows.  This probes the raw XLA
int8 dot vs bf16 dot at exactly those shapes with loop-variant inputs
(per-iteration keyed data; one scan, one scalar pull) to decide whether a
W8A8 prefill path is worth building.

Run: python script/bench_w8a8_probe.py   (real chip)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = [
    (2432, 2048, 5504),  # 1b B=8 gate/up
    (2432, 5504, 2048),  # 1b B=8 down
    (2432, 2048, 2048),  # 1b B=8 qkvo
    (4864, 2560, 6912),  # 2b B=8 gate/up
    (624, 2048, 5504),   # B=1 control (the round-2 stall regime)
]
ITERS = 30


def bench(m, k, n, dtype):
    def run(w, rng, it):
        def body(c, r):
            x = jax.random.normal(r, (m, k), jnp.bfloat16)
            if dtype == "int8":
                x = (x * 10).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return c + jnp.sum(acc, dtype=jnp.int32).astype(jnp.float32), None
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return c + jnp.sum(acc), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(rng, it))
        return acc

    f = jax.jit(run, static_argnums=(2,))
    if dtype == "int8":
        w = jax.random.randint(jax.random.PRNGKey(0), (k, n), -127, 128, dtype=jnp.int8)
    else:
        w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.bfloat16)
    float(f(w, jax.random.PRNGKey(1), ITERS))
    t0 = time.perf_counter()
    float(f(w, jax.random.PRNGKey(2), ITERS))
    dt = (time.perf_counter() - t0) / ITERS
    return 2.0 * m * k * n / dt / 1e12


def main():
    print("shape (M,K,N) | bf16 TFLOP/s | int8 TOPS | ratio")
    for m, k, n in SHAPES:
        t_bf = bench(m, k, n, "bf16")
        t_i8 = bench(m, k, n, "int8")
        print(f"({m},{k},{n})  {t_bf:8.1f}  {t_i8:8.1f}  {t_i8 / t_bf:5.2f}x")


if __name__ == "__main__":
    main()
