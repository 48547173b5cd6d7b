"""Continuous-batching decode rate: engine vs sequential generate (real TPU).

Measures the AR-serving analogue of the flow micro-batch multiplier: N
concurrent clients stream prompts through the ContinuousBatchingEngine
(slot-coalesced decode steps) vs the same N requests served sequentially by
the fused per-request generate().  1b-class LLM decode is HBM-bandwidth-
bound (every step streams all weights for one token per live slot), so
coalescing S slots multiplies tokens/s by ~S until the batch matmul turns
compute-bound.

Run: python script/bench_decode_engine.py      (real chip)
Env: BENCH_SCALE=test|1b  BENCH_SLOTS=8  BENCH_NEW=32  BENCH_CLIENTS=8

BENCH_HOL=1: head-of-line latency mode — one victim client decodes a long
generation while long-prompt admissions arrive; reports the victim-visible
max inter-tick stall for one-shot vs chunked (BENCH_CHUNK, default 256)
prefill.  Chunked admission interleaves decode ticks between prompt
chunks, so the stall should drop to ~chunk/prompt_len of the one-shot gap.
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCALE = os.environ.get("BENCH_SCALE", "1b")
SLOTS = int(os.environ.get("BENCH_SLOTS", "8"))
NEW = int(os.environ.get("BENCH_NEW", "32"))
CLIENTS = int(os.environ.get("BENCH_CLIENTS", "8"))


def build():
    from dexbotic_tpu.models.vlm import VLMConfig
    from dexbotic_tpu.nn.transformer import TransformerConfig
    from dexbotic_tpu.nn.vit import ViTConfig, SIGLIP_SO400M_224

    if SCALE == "test":
        llm = TransformerConfig(vocab_size=2048, hidden_size=256, num_layers=2,
                                num_heads=2, num_kv_heads=2, head_dim=128,
                                intermediate_size=512)
        vit = ViTConfig(image_size=112, patch_size=14, hidden_size=256,
                        num_layers=2, num_heads=4, intermediate_size=512,
                        select_layer=None)
    else:  # 1b-class (the OFT-Discrete / NaVILA serving regime)
        llm = TransformerConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                                num_heads=16, num_kv_heads=16, head_dim=128,
                                intermediate_size=5504)
        vit = SIGLIP_SO400M_224
    return VLMConfig(llm=llm, vit=vit)


def main():
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.exp.decode_engine import ContinuousBatchingEngine
    from dexbotic_tpu.models.generate import generate
    from dexbotic_tpu.models.vlm import init_vlm

    cfg = build()
    params = init_vlm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    nt = cfg.num_image_tokens
    rs = np.random.RandomState(0)
    size = cfg.vit.image_size

    def make_prompt(i):
        ids = rs.randint(1, 30000, nt + 32)
        ids[:nt] = IMAGE_TOKEN_INDEX
        img = rs.randn(1, size, size, 3).astype(np.float32)
        return ids, img

    prompts = [make_prompt(i) for i in range(CLIENTS)]

    # -- sequential fused generate (the reference's serving pattern) --------
    ids0, img0 = prompts[0]
    gen = jax.jit(lambda p, i, v, im, r: generate(
        p, cfg, i, v, im, max_new_tokens=NEW, eos_token_id=-1, rng=r)[0])
    v0 = jnp.ones((1, len(ids0)), jnp.int32)
    _ = np.asarray(gen(params, jnp.asarray(ids0)[None], v0,
                       jnp.asarray(img0)[None], jax.random.PRNGKey(1)))  # compile
    t0 = time.perf_counter()
    for ids, img in prompts:
        _ = np.asarray(gen(params, jnp.asarray(ids)[None],
                           jnp.ones((1, len(ids)), jnp.int32),
                           jnp.asarray(img)[None], jax.random.PRNGKey(2)))
    seq_dt = time.perf_counter() - t0
    seq_rate = CLIENTS * NEW / seq_dt

    # -- continuous batching engine ----------------------------------------
    eng = ContinuousBatchingEngine(
        params, cfg, slots=SLOTS, max_prompt=512, max_new=NEW,
        eos_token_id=-1, steps_per_tick=8,
    )
    # warm both compiled programs (prefill bucket + step) with one request
    eng.submit(prompts[0][0], images=prompts[0][1], max_new=NEW)

    results = [None] * CLIENTS

    def run(i):
        ids, img = prompts[i]
        results[i] = eng.submit(ids, images=img, max_new=NEW, timeout=1800)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=run, args=(i,)) for i in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    eng_dt = time.perf_counter() - t0
    eng_rate = CLIENTS * NEW / eng_dt
    assert all(len(r) == NEW for r in results)
    eng.close()

    print({
        "scale": SCALE, "clients": CLIENTS, "slots": SLOTS, "new_tokens": NEW,
        "sequential_tok_per_s": round(seq_rate, 1),
        "engine_tok_per_s": round(eng_rate, 1),
        "multiplier": round(eng_rate / seq_rate, 2),
        "coalesced_ticks": eng.batched_steps,
    })


def main_hol():
    """Max decode stall seen by an in-flight generation during admissions."""
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.exp.decode_engine import ContinuousBatchingEngine
    from dexbotic_tpu.models.vlm import init_vlm

    cfg = build()
    params = init_vlm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    nt = cfg.num_image_tokens
    rs = np.random.RandomState(0)
    size = cfg.vit.image_size
    plen = int(os.environ.get("BENCH_PROMPT", "1024"))  # long text prompts
    chunk = int(os.environ.get("BENCH_CHUNK", "256"))

    def long_prompt():
        ids = rs.randint(1, 30000, nt + plen)
        ids[:nt] = IMAGE_TOKEN_INDEX
        return ids, rs.randn(1, size, size, 3).astype(np.float32)

    victim = long_prompt()
    admits = [long_prompt() for _ in range(4)]
    out = {}
    for label, pc in (("oneshot", None), ("chunked", chunk)):
        eng = ContinuousBatchingEngine(
            params, cfg, slots=SLOTS, max_prompt=_cap(nt + plen), max_new=NEW,
            eos_token_id=-1, steps_per_tick=1, prefill_chunk=pc,
        )
        # per-label failure tolerance: at 8 slots x 4k the oneshot admission
        # path (separate prefill cache + install scatter) can OOM one chip
        # while the in-cache chunked path fits — report that honestly
        # instead of dying
        try:
            _run_hol_label(eng, label, victim, admits, out)
        except Exception as e:  # noqa: BLE001
            out[label] = {"error": type(e).__name__}
        finally:
            eng.close()
            del eng
            import gc

            gc.collect()
    _print_hol(out, nt, plen, chunk)


def _run_hol_label(eng, label, victim, admits, out):
    errs = []

    def sub(p, new):
        try:
            eng.submit(p[0], images=p[1], max_new=new, timeout=1800)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def scenario(new):
        """Victim decodes; a 4-request burst admits mid-generation."""
        t = threading.Thread(target=sub, args=(victim, new))
        t.start()
        while len(eng.tick_times) < 2 and not errs:  # victim decoding
            time.sleep(0.005)
        threads = [threading.Thread(target=sub, args=(p, new)) for p in admits]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        t.join()
        if errs:
            raise errs[0]

    # warm run covers every program incl. the burst-admission batch
    # shapes (a mid-measurement XLA compile would swamp the stall)
    scenario(4)
    eng.tick_times.clear()
    eng.admit_log.clear()
    t_base = time.perf_counter()
    scenario(NEW)
    ticks = np.asarray(eng.tick_times)
    gaps = np.diff(ticks) * 1e3
    out[label] = {
        "max_stall_ms": round(float(gaps.max()), 1),
        "p50_tick_ms": round(float(np.median(gaps)), 1),
        "top_gaps_ms": [round(float(g), 1) for g in np.sort(gaps)[::-1][:6]],
        "ticks": int(len(ticks)),
        "admits": [
            (round((a - t_base) * 1e3), round((b - a) * 1e3), B, bk, int(ch))
            for a, b, B, bk, ch in eng.admit_log
        ],  # (start_ms, dur_ms, n_reqs, bucket, chunked)
    }
    # incremental: a timed-out run still leaves the finished label's data
    print(f"[{label}] {out[label]}", flush=True)


def _print_hol(out, nt, plen, chunk):
    res = {
        "scale": SCALE, "slots": SLOTS, "prompt_tokens": nt + plen,
        "chunk": chunk, "new_tokens": NEW,
        **{f"{k}_{m}": v for k, d in out.items() for m, v in d.items()},
    }
    if "max_stall_ms" in out.get("oneshot", {}) and "max_stall_ms" in out.get("chunked", {}):
        res["stall_reduction"] = round(
            out["oneshot"]["max_stall_ms"] / max(out["chunked"]["max_stall_ms"], 1e-6), 2)
    print(res)


def main_diag():
    """Per-phase admission cost with forced syncs (BENCH_DIAG=1): where does
    the first chunked-admission tick window actually go?  Pulls one scalar
    after each phase to force completion (block_until_ready is unreliable
    through the axon tunnel)."""
    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.exp.decode_engine import ContinuousBatchingEngine
    from dexbotic_tpu.models.vlm import init_vlm

    cfg = build()
    params = init_vlm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    nt = cfg.num_image_tokens
    rs = np.random.RandomState(0)
    size = cfg.vit.image_size
    plen = int(os.environ.get("BENCH_PROMPT", "4096"))
    chunk = int(os.environ.get("BENCH_CHUNK", "512"))
    bucket = _cap(nt + plen)
    B = 4

    eng = ContinuousBatchingEngine(
        params, cfg, slots=SLOTS, max_prompt=bucket, max_new=NEW,
        eos_token_id=-1, steps_per_tick=1, prefill_chunk=chunk,
    )
    ids = np.zeros((B, bucket), np.int32)
    valid = np.zeros((B, bucket), np.int32)
    for i in range(B):
        p = rs.randint(1, 30000, nt + plen)
        p[:nt] = IMAGE_TOKEN_INDEX
        ids[i, : nt + plen] = p
        valid[i, : nt + plen] = 1
    imgs_np = rs.randn(B, 1, size, size, 3).astype(np.float32)

    def phases():
        t = {}

        def mark(name, t0):
            t[name] = round((time.perf_counter() - t0) * 1e3, 1)

        t0 = time.perf_counter()
        images = jnp.asarray(imgs_np)
        _ = jax.device_get(images[0, 0, 0, 0, 0])
        mark("upload_imgs", t0)
        t0 = time.perf_counter()
        ids_d = jnp.asarray(ids)
        _ = jax.device_get(ids_d[0, 0])
        mark("upload_ids", t0)
        t0 = time.perf_counter()
        emb = eng._embed_fn()(eng.params, ids_d, images)
        _ = jax.device_get(emb[0, 0, 0])
        mark("embed", t0)
        lens = jnp.asarray([nt + plen] * B, jnp.int32)
        slots_arr = jnp.asarray([0, 1, 2, 3], jnp.int32)
        chunk_fn = eng._chunk_fn()
        t0 = time.perf_counter()
        eng.cache, eng.last_hidden = chunk_fn(
            eng.params, emb[:, 0:chunk], jnp.asarray(valid[:, 0:chunk]),
            np.int32(0), lens, slots_arr, eng.cache, eng.last_hidden, True)
        _ = jax.device_get(eng.last_hidden[0, 0])
        mark("chunk0_clear", t0)
        t0 = time.perf_counter()
        eng.cache, eng.last_hidden = chunk_fn(
            eng.params, emb[:, chunk:2 * chunk], jnp.asarray(valid[:, chunk:2 * chunk]),
            np.int32(chunk), lens, slots_arr, eng.cache, eng.last_hidden, False)
        _ = jax.device_get(eng.last_hidden[0, 0])
        mark("chunk1", t0)
        t0 = time.perf_counter()
        eng._decode_tick()  # no live slots: returns immediately
        mark("tick_nolive", t0)
        return t

    cold = phases()  # includes compiles
    eng._reset_state()
    warm = phases()
    warm2 = phases()
    eng.close()
    print({"scale": SCALE, "slots": SLOTS, "bucket": bucket, "chunk": chunk,
           "cold": cold, "warm": warm, "warm2": warm2})


def _cap(n: int, mult: int = 64) -> int:
    return -(-n // mult) * mult


if __name__ == "__main__":
    if os.environ.get("BENCH_DIAG"):
        main_diag()
    elif os.environ.get("BENCH_HOL"):
        main_hol()
    else:
        main()
