"""NaVILA 4k packed-training bench: Pallas flash attention vs XLA, real TPU.

The round-1 review asked for proof that the Pallas kernel's long-context win
pays off in a REAL training step, not just the attention microbench: this
times one packed NaVILA train step (value_and_grad of navila_packed_loss —
ViT encode + gather-splice + segment-isolated 4k causal attention + soft-CE)
at 1b-class LLM size with attn_impl 'xla' vs 'pallas' (multi-block kernel;
4096 >= the kv>=1024 dispatch bound, so 'auto' picks the same).

Run: python script/bench_navila_pack.py   (real chip; ~2 compiles)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def build(attn_impl: str):
    from dexbotic_tpu.models.navila import NaVILAConfig
    from dexbotic_tpu.models.vlm import VLMConfig
    from dexbotic_tpu.nn.transformer import TransformerConfig
    from dexbotic_tpu.nn.vit import ViTConfig

    llm = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=16,
        num_kv_heads=16, head_dim=128, intermediate_size=5504,
        attn_impl=attn_impl,
    )
    vit = ViTConfig(image_size=112, patch_size=14, hidden_size=512,
                    num_layers=4, num_heads=8, intermediate_size=1024,
                    select_layer=None)
    return NaVILAConfig(vlm=VLMConfig(llm=llm, vit=vit, projector_type="linear"),
                        num_video_frames=4)


def make_packed(cfg, rows=2, max_len=4096, n_samples=8):
    """n_samples sequences of ~1k tokens (4 frames x 64 image tokens + text)
    packed into rows x 4096."""
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.navila import pack_batch

    nt = cfg.vlm.num_image_tokens  # per frame
    rs = np.random.RandomState(0)
    per = cfg.num_video_frames * nt + 64  # frames + text
    ids = np.zeros((n_samples, per), np.int64)
    labels = np.full((n_samples, per), -100, np.int64)
    valid = np.ones((n_samples, per), np.int64)
    for i in range(n_samples):
        cur = 0
        for _ in range(cfg.num_video_frames):
            ids[i, cur : cur + nt] = IMAGE_TOKEN_INDEX
            cur += nt
        text = rs.randint(3, 31000, per - cur)
        ids[i, cur:] = text
        labels[i, cur:] = text
    packed = pack_batch(ids, labels, valid, num_rows=rows, max_len=max_len)
    images = rs.randn(
        n_samples, cfg.num_video_frames, cfg.vlm.vit.image_size,
        cfg.vlm.vit.image_size, 3,
    ).astype(np.float32)
    return {
        **{k: jnp.asarray(v) for k, v in packed.items()},
        "images": jnp.asarray(images),
    }


def bench(attn_impl: str, iters=20):
    from dexbotic_tpu.models.navila import init_navila, navila_packed_loss

    cfg = build(attn_impl)
    params = init_navila(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    batch = make_packed(cfg)

    def step(p, b):
        def loss_fn(pp):
            loss, _ = navila_packed_loss(pp, cfg, b, remat=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree.leaves(grads))
        return loss.astype(jnp.float32), gn

    def many(p, b, rng):
        # per-iteration input perturbation: keeps the step loop-VARIANT so
        # XLA cannot hoist the whole computation out of the scan
        def body(c, r):
            eps = jax.random.uniform(r, (), jnp.float32, 0.0, 1e-6)
            b2 = {**b, "images": b["images"] + eps.astype(b["images"].dtype)}
            loss, gn = step(p, b2)
            return c + loss + gn * 1e-30, None

        return jax.lax.scan(body, jnp.float32(0), jax.random.split(rng, iters))[0]

    f = jax.jit(many)
    r = f(params, batch, jax.random.PRNGKey(1))
    r.block_until_ready()
    t0 = time.perf_counter()
    r = f(params, batch, jax.random.PRNGKey(2))
    total = float(r)  # pulls the scalar -> syncs
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(total)
    return dt * 1e3


def main():
    n_tok = 2 * 4096
    print("NaVILA packed train step (2x4096 tokens, 1b-class, bf16, remat):")
    times = {}
    for impl in ("xla", "pallas"):
        times[impl] = bench(impl)
        print(f"  {impl:6s} {times[impl]:7.1f} ms/step "
              f"({n_tok / times[impl] * 1e3:8.0f} tok/s)", flush=True)
    print(f"  pallas speedup {times['xla'] / times['pallas']:4.2f}x")


if __name__ == "__main__":
    main()
