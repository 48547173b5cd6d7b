"""Continuous-batching AR decode engine (exp/decode_engine.py).

Covers the round-3 VERDICT item: batched decode-step KV-cache serving for
the AR policies — correctness vs the single-request generate() path, slot
reuse, per-row cache writes (mot_forward write_cols), and actual step
coalescing under concurrent clients.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.exp.decode_engine import ContinuousBatchingEngine
from dexbotic_tpu.models.generate import generate
from dexbotic_tpu.models.presets import LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig, init_vlm
from dexbotic_tpu.nn.transformer import (
    Stream, init_kv_cache, init_transformer, mot_forward,
)

VLM = VLMConfig(llm=LLM_TEST, vit=VIT_TEST)


def _prompt(rs, text_len):
    nt = VLM.num_image_tokens
    ids = rs.randint(1, 400, nt + text_len)
    ids[:nt] = IMAGE_TOKEN_INDEX
    img = rs.randn(1, 28, 28, 3).astype(np.float32)
    return ids, img


def test_write_cols_matches_cursor_path():
    """A single-token cache update via per-row write_cols must equal the
    shared-cursor dynamic_update_slice path when the columns coincide."""
    cfg = LLM_TEST
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    B, P = 2, 8
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(B, P, cfg.hidden_size).astype(np.float32))
    valid = jnp.ones((B, P), jnp.int32)
    grp = jnp.cumsum(valid, axis=1)
    pos = grp - 1
    cache = init_kv_cache(cfg, B, P + 2, dtype=jnp.float32)
    _, cache = mot_forward(
        [Stream(cfg, params, x)], positions=pos, q_grp=grp, q_valid=valid,
        cache=cache, update_cache=True,
    )

    tok = jnp.asarray(rs.randn(B, 1, cfg.hidden_size).astype(np.float32))
    pos1 = jnp.full((B, 1), P, jnp.int32)
    grp1 = pos1 + 1
    v1 = jnp.ones((B, 1), jnp.int32)

    out_a, cache_a = mot_forward(
        [Stream(cfg, params, tok)], positions=pos1, q_grp=grp1, q_valid=v1,
        cache=cache, update_cache=True,
    )
    out_b, cache_b = mot_forward(
        [Stream(cfg, params, tok)], positions=pos1, q_grp=grp1, q_valid=v1,
        cache=cache, update_cache=True, write_cols=jnp.full((B,), P, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_a["k"]), np.asarray(cache_b["k"]),
                               rtol=1e-5, atol=1e-5)
    # write_cols leaves the shared cursor untouched (caller-owned occupancy)
    assert int(cache_b["length"]) == P and int(cache_a["length"]) == P + 1


def test_engine_matches_generate_greedy():
    """Engine output == the fused single-request generate() for each of
    several concurrent prompts of different lengths."""
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    rs = np.random.RandomState(2)
    prompts = [_prompt(rs, t) for t in (4, 6, 9)]
    T = 5

    expected = []
    for ids, img in prompts:
        toks, _ = generate(
            params, VLM, jnp.asarray(ids)[None], jnp.ones((1, len(ids)), jnp.int32),
            jnp.asarray(img)[None], max_new_tokens=T, eos_token_id=-1,
            temperature=0.0,
        )
        expected.append(np.asarray(toks)[0].tolist())

    eng = ContinuousBatchingEngine(
        params, VLM, slots=2, max_prompt=64, max_new=T,
        eos_token_id=-1, temperature=0.0, steps_per_tick=2,
    )
    try:
        results = [None] * len(prompts)

        def run(i):
            ids, img = prompts[i]
            results[i] = eng.submit(ids, images=img, max_new=T, timeout=300)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, exp in enumerate(expected):
            assert results[i] == exp, f"prompt {i}: {results[i]} != {exp}"
        # 3 requests through 2 slots: slot reuse exercised, and with
        # concurrent clients at least one tick must have served >1 slot
        assert eng.batched_steps > 0
    finally:
        eng.close()


def test_engine_chunked_prefill_matches_generate():
    """prefill_chunk: admission through chunk-sized incremental prefills
    (decode ticks interleaved) must produce the same greedy tokens as the
    one-shot prefill path / the fused generate()."""
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    rs = np.random.RandomState(7)
    prompts = [_prompt(rs, t) for t in (23, 4, 11)]
    T = 4

    expected = []
    for ids, img in prompts:
        toks, _ = generate(
            params, VLM, jnp.asarray(ids)[None], jnp.ones((1, len(ids)), jnp.int32),
            jnp.asarray(img)[None], max_new_tokens=T, eos_token_id=-1,
            temperature=0.0,
        )
        expected.append(np.asarray(toks)[0].tolist())

    eng = ContinuousBatchingEngine(
        params, VLM, slots=2, max_prompt=64, max_new=T,
        eos_token_id=-1, temperature=0.0, steps_per_tick=1, prefill_chunk=16,
    )
    try:
        # submit the longest prompt first so later admissions interleave
        # decode ticks for it between their prefill chunks
        results = [None] * len(prompts)

        def run(i):
            ids, img = prompts[i]
            results[i] = eng.submit(ids, images=img, max_new=T, timeout=300)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, exp in enumerate(expected):
            assert results[i] == exp, f"prompt {i}: {results[i]} != {exp}"
    finally:
        eng.close()


def test_engine_eos_stops_early():
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    rs = np.random.RandomState(3)
    ids, img = _prompt(rs, 5)
    # find what greedy emits first, then use THAT id as eos: generation must
    # stop after one token
    toks, _ = generate(
        params, VLM, jnp.asarray(ids)[None], jnp.ones((1, len(ids)), jnp.int32),
        jnp.asarray(img)[None], max_new_tokens=3, eos_token_id=-1, temperature=0.0,
    )
    first = int(np.asarray(toks)[0, 0])
    eng = ContinuousBatchingEngine(
        params, VLM, slots=2, max_prompt=64, max_new=8,
        eos_token_id=first, temperature=0.0, steps_per_tick=4,
    )
    try:
        out = eng.submit(ids, images=img, timeout=300)
        assert out == [first]
    finally:
        eng.close()


def test_engine_failed_step_fails_requests_not_clients():
    """A failing step dispatch must (a) error the in-flight requests rather
    than hanging their client threads, and (b) leave the engine serviceable
    (state reset) OR mark it dead so later submits fail fast — never a
    silent hang.  Exercises the donation-aware failure path (_fail_live /
    _reset_state / _dead)."""
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    rs = np.random.RandomState(4)
    ids, img = _prompt(rs, 5)
    eng = ContinuousBatchingEngine(
        params, VLM, slots=2, max_prompt=64, max_new=4,
        eos_token_id=-1, temperature=0.0, steps_per_tick=2,
    )
    try:
        boom = RuntimeError("injected step failure")

        def bad_step(*a, **k):
            raise boom

        eng._step_fn = bad_step
        try:
            eng.submit(ids, images=img, timeout=60)
            raise AssertionError("submit should have raised")
        except RuntimeError as e:
            assert "injected" in str(e) or "dead" in str(e)
        # engine state was reset; a healthy step fn serves again
        eng._step_fn = jax.jit(eng._make_step(), static_argnums=(8,))
        assert eng._dead is None
        out = eng.submit(ids, images=img, timeout=300)
        assert len(out) == 4
    finally:
        eng.close()


def test_engine_dead_loop_fails_fast():
    """If the loop thread itself dies (e.g. reset OOM), queued and future
    submits must raise promptly instead of blocking until timeout."""
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    rs = np.random.RandomState(5)
    ids, img = _prompt(rs, 5)
    eng = ContinuousBatchingEngine(
        params, VLM, slots=2, max_prompt=64, max_new=4,
        eos_token_id=-1, temperature=0.0, steps_per_tick=2,
    )
    try:
        boom = RuntimeError("injected loop death")

        def bad_tick(*a, **k):
            raise boom

        eng._decode_tick = bad_tick  # _loop_inner raises -> _loop marks dead
        try:
            eng.submit(ids, images=img, timeout=60)
            raise AssertionError("submit should have raised")
        except RuntimeError:
            pass
        assert eng._dead is not None
        try:
            eng.submit(ids, images=img, timeout=60)
            raise AssertionError("second submit should fail fast")
        except RuntimeError as e:
            assert "dead" in str(e)
    finally:
        eng.close()


def test_engine_chunked_slot_reuse_clears_stale_occupancy():
    """In-cache chunked admission writes straight into the engine cache; a
    slot previously occupied by a LONGER prompt must not leak ghost tokens
    (stale valid=1 columns deeper than the new prompt) into the reused
    row's attention."""
    params = init_vlm(jax.random.PRNGKey(0), VLM)
    rs = np.random.RandomState(11)
    long_p = _prompt(rs, 30)
    short_p = _prompt(rs, 6)
    T = 4

    eng = ContinuousBatchingEngine(
        params, VLM, slots=1, max_prompt=64, max_new=T,
        eos_token_id=-1, temperature=0.0, steps_per_tick=1, prefill_chunk=8,
    )
    try:
        for ids, img in (long_p, short_p):
            exp, _ = generate(
                params, VLM, jnp.asarray(ids)[None],
                jnp.ones((1, len(ids)), jnp.int32), jnp.asarray(img)[None],
                max_new_tokens=T, eos_token_id=-1, temperature=0.0,
            )
            got = eng.submit(ids, images=img, max_new=T, timeout=300)
            assert got == np.asarray(exp)[0].tolist()
    finally:
        eng.close()
