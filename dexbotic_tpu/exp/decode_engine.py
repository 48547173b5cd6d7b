"""Continuous batching for autoregressive policies (OFT-Discrete text heads,
Discrete-VLA, MUVLA, NaVILA): slot-based decode-step coalescing.

The reference serves AR generation strictly sequentially — one request holds
the GPU through its whole HF ``generate`` loop
(/root/reference/dexbotic/model/oft/oft_discrete_arch.py:238-282,
muvla_arch.py:609-682; Flask threaded=False).  The TPU-native replacement is
the AR analogue of the flow-policy micro-batcher (exp/serve.py): requests
join and leave a fixed set of decode SLOTS at token-step granularity, so one
jitted decode step serves every in-flight request at once.

XLA needs static shapes, so continuous batching is expressed as:

  * one engine KV cache of shape [slots, max_prompt + max_new, ...]; each
    slot owns its row.  Buffer columns are storage, not logical positions —
    RoPE positions and the cumsum-grp attention masks are explicit, so
    slot rows at different depths coexist in one attention call.
  * ADMIT: a B=1 prefill program (prompt length padded to 64-token buckets)
    runs the prompt and its cache row + last hidden state are scattered
    into the engine arrays at the free slot's row.
  * STEP: ONE jitted program advances all slots ``steps_per_tick`` tokens
    (a lax.scan): sample -> embed -> single-token forward with per-row
    ``write_cols`` (nn/transformer.py mot_forward) -> new hidden.  Finished
    or empty slots ride along masked (valid=0), costing no correctness and
    amortized nothing: the MXU work is the same batched matmul either way.
  * RETIRE: host-side, slots whose row hit EOS or max_new free up and the
    next queued request is admitted.

Two compiled programs total (prefill per bucket + one step program) — no
per-request compilation, no head-of-line blocking by long generations.

Optional ``prefill_chunk``: admission feeds the prompt ``chunk`` tokens at
a time DIRECTLY into the engine cache (embed/ViT one dispatch up front;
each LLM chunk runs at B=slots with non-admitted rows parked on an
out-of-bounds write column so their scatter writes drop; grp/positions
auto-continue per row from the cache's valid count) and runs one decode
tick for the already-live slots between chunks — a long prefill no longer
stalls in-flight generations for its whole duration, and admission
allocates NO second KV cache (peak HBM = params + ONE engine cache, the
difference between an 8-slot 4k-context 1b engine fitting one v5e chip or
OOMing).  vLLM-style chunked prefill + in-place cache writes, expressed
with static shapes.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.models.vlm import VLMConfig, vlm_forward
from dexbotic_tpu.nn.transformer import embed_tokens, init_kv_cache, lm_logits


def _bucket(n: int, mult: int = 64) -> int:
    return -(-n // mult) * mult


@dataclass
class _Request:
    ids: np.ndarray  # int[S] prompt (unpadded)
    images: Optional[np.ndarray]
    embeds: Optional[np.ndarray]  # pre-spliced prompt embeds [S, H]
    max_new: int
    event: threading.Event = field(default_factory=threading.Event)
    tokens: list = field(default_factory=list)
    error: Optional[Exception] = None
    slot: int = -1
    # device-staged inputs, uploaded on the SUBMITTING thread (submit()):
    # host->device transfers through a TPU tunnel cost 100s of ms, and done
    # on the engine loop thread they land inside the head-of-line window of
    # every in-flight decode.  Client-side staging overlaps them with ticks.
    bucket: int = 0
    ids_dev: Optional[jax.Array] = None  # int[bucket] padded prompt
    valid_dev: Optional[jax.Array] = None  # int[bucket]
    images_dev: Optional[jax.Array] = None
    embeds_dev: Optional[jax.Array] = None  # [bucket, H] padded on device


class ContinuousBatchingEngine:
    """Token-level request coalescing over a fixed slot set.

    Args:
        params/cfg: VLM params + config (the ``{"llm","vit","projector"}``
            tree that vlm_forward takes).
        slots: max concurrent decodes (the decode batch size).
        max_prompt: prompt capacity per slot (bucketed prefill pads up to it).
        max_new: decode capacity per slot.
        eos/pad token ids, temperature: sampling config.
        steps_per_tick: decode steps fused into one dispatch (amortizes the
            per-dispatch RPC through the axon tunnel; finished slots emit
            pads that are dropped host-side).
    """

    def __init__(self, params, cfg: VLMConfig, *, slots: int = 8,
                 max_prompt: int = 512, max_new: int = 64,
                 eos_token_id: int = 2, pad_token_id: int = 0,
                 temperature: float = 0.0, steps_per_tick: int = 4,
                 prefill_chunk: Optional[int] = None,
                 rng: Optional[jax.Array] = None):
        self.params, self.cfg = params, cfg
        self.S, self.P, self.N = slots, max_prompt, max_new
        self.eos, self.pad = eos_token_id, pad_token_id
        self.temperature = temperature
        self.k = steps_per_tick
        # chunked prefill: feed admissions through the prefill cache
        # ``prefill_chunk`` tokens at a time, running one decode tick for the
        # already-live slots between chunks.  Bounds head-of-line decode
        # latency under admission bursts (a 512-token prefill no longer
        # stalls in-flight generations for its whole duration).  None =
        # one-shot prefill (lowest total admission cost).
        self.chunk = None if not prefill_chunk else int(prefill_chunk)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

        C = self.P + self.N
        self.cache = init_kv_cache(cfg.llm, slots, C, dtype=jnp.bfloat16)
        H = cfg.llm.hidden_size
        self.last_hidden = jnp.zeros((slots, H), jnp.bfloat16)
        # host mirrors of per-slot state
        self.prompt_len = np.zeros(slots, np.int32)
        self.n_dec = np.zeros(slots, np.int32)
        self.live = np.zeros(slots, bool)
        self.reqs: list[Optional[_Request]] = [None] * slots
        self.batched_steps = 0  # observability: ticks that served >1 slot
        # observability: wall-clock of each decode tick (bounded); the max
        # inter-tick gap while slots are live is the head-of-line stall an
        # in-flight generation sees during admissions (bench_decode_engine
        # BENCH_HOL mode reads this to quantify chunked-prefill admission)
        self.tick_times: list[float] = []
        # observability: (t_start, t_end, n_reqs, bucket, chunked) per
        # admission batch — lets benches attribute decode stalls to
        # admission phases (bounded like tick_times)
        self.admit_log: list[tuple] = []

        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._dead: Optional[Exception] = None  # fatal engine failure
        self._epoch = 0  # bumped by _reset_state; detects mid-admission resets
        self._prefill_fns: dict = {}
        # donate the engine cache + last_hidden through the step/install
        # programs: without donation every tick holds TWO copies of the
        # multi-GB KV cache (input + output) — the difference between a
        # 4k-context 8-slot 1b engine fitting one v5e chip or OOMing.
        # CPU ignores donation (tests run there); gate to avoid warnings.
        donate = (jax.default_backend() != "cpu")
        self._step_fn = jax.jit(self._make_step(), static_argnums=(8,),
                                donate_argnums=(1, 2) if donate else ())
        self._install_fn = jax.jit(self._install,
                                   donate_argnums=(0, 1) if donate else ())
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- device programs --------------------------------------------------

    def _prefill(self, batch: int, bucket: int, with_images: bool, with_embeds: bool):
        key = (batch, bucket, with_images, with_embeds)
        fn = self._prefill_fns.get(key)
        if fn is None:
            cfg = self.cfg

            def prefill(params, ids, valid, images, embeds):
                cache = init_kv_cache(cfg.llm, batch, bucket, dtype=jnp.bfloat16)
                hidden, cache = vlm_forward(
                    params, cfg, ids, valid,
                    images=images if with_images else None,
                    inputs_embeds=embeds if with_embeds else None,
                    cache=cache, update_cache=True,
                )
                last = jnp.take_along_axis(
                    hidden, (jnp.sum(valid, axis=1) - 1)[:, None, None], axis=1
                )[:, 0]
                return cache, last

            fn = self._prefill_fns[key] = jax.jit(prefill)
        return fn

    def _embed_fn(self):
        """ids(+images) -> spliced prompt embeds [B, bucket, H].  The ViT
        encode is one dispatch regardless of chunking; only the LLM prefill
        is chunked."""
        fn = getattr(self, "_embed_jit", None)
        if fn is None:
            from dexbotic_tpu.models.vlm import encode_images, splice_image_embeds

            cfg = self.cfg

            def embed(params, ids, images):
                if images is None:
                    return embed_tokens(params["llm"], cfg.llm, ids)
                feats = encode_images(params, cfg, images)
                return splice_image_embeds(params, cfg, ids, feats)

            fn = self._embed_jit = jax.jit(embed, static_argnums=())
        return fn

    def _chunk_fn(self):
        """One in-cache prefill chunk: scatter the admitted rows' embed
        slice to all S slot rows (non-admitted rows ride along with valid=0
        and an out-of-bounds ``write_cols`` parking column, so their scatter
        writes are dropped), run ONE vlm_forward at B=S directly against the
        ENGINE cache, and keep the running last-valid hidden per row.

        This is the vLLM-style design point expressed with static shapes:
        prefill writes straight into the serving cache, so chunked admission
        allocates NO separate prefill cache and needs NO install scatter —
        peak HBM is params + one engine cache (an 8-slot 4k-context
        1b-class engine fits one v5e chip; the install path did not).
        grp/positions auto-continue per row from the cache's valid count
        (models/vlm.py vlm_forward)."""
        fn = getattr(self, "_chunk_jit", None)
        if fn is None:
            cfg, S, C = self.cfg, self.S, self.P + self.N

            def chunk(params, emb, valid, off, lens, slots, cache, last, clear):
                if clear:
                    # first chunk of an admission: zero the admitted rows'
                    # occupancy metadata IN the same program (stale valid=1
                    # columns deeper than the new prompt would otherwise be
                    # attended as ghost tokens; fusing it here saves a
                    # dispatch round-trip in the head-of-line window)
                    cache = dict(cache)
                    for f in ("grp", "valid", "seg"):
                        cache[f] = cache[f].at[slots].set(0)
                c, H = emb.shape[1], emb.shape[2]
                emb_s = jnp.zeros((S, c, H), emb.dtype).at[slots].set(emb)
                valid_s = (
                    jnp.zeros((S, c), jnp.int32).at[slots].set(valid.astype(jnp.int32))
                )
                offs = jnp.full((S,), C, jnp.int32).at[slots].set(off)
                hidden, cache = vlm_forward(
                    params, cfg, jnp.zeros((S, c), jnp.int32), valid_s,
                    inputs_embeds=emb_s, cache=cache, update_cache=True,
                    write_cols=offs,
                )
                lens_s = jnp.zeros((S,), jnp.int32).at[slots].set(lens)
                rel = jnp.clip(lens_s - 1 - off, 0, c - 1)
                cand = jnp.take_along_axis(hidden, rel[:, None, None], axis=1)[:, 0]
                in_chunk = (lens_s - 1 >= off) & (lens_s - 1 < off + c)
                last = jnp.where(in_chunk[:, None], cand.astype(last.dtype), last)
                return cache, last

            donate = (jax.default_backend() != "cpu")
            fn = self._chunk_jit = jax.jit(
                chunk, static_argnums=(8,),
                donate_argnums=(6, 7) if donate else ())
        return fn

    def _install(self, cache, last_hidden, pcache, plast, slots):
        """Scatter B prefilled rows (length P-bucket) into the engine cache
        at rows ``slots`` (int[B]), zeroing the rest of each row's
        occupancy — ONE scatter per array, not one cache copy per slot."""
        C = cache["grp"].shape[1]
        new = dict(cache)

        def pad_kv(a):  # [L, B, bucket, H, D] -> [L, B, C, H, D], zero tail
            return jnp.pad(a, [(0, 0), (0, 0), (0, C - a.shape[2]), (0, 0), (0, 0)])

        def pad_row(a):  # [B, bucket] -> [B, C]; zeros clear stale occupancy
            return jnp.pad(a, [(0, 0), (0, C - a.shape[1])])

        new["k"] = cache["k"].at[:, slots].set(pad_kv(pcache["k"]).astype(cache["k"].dtype))
        new["v"] = cache["v"].at[:, slots].set(pad_kv(pcache["v"]).astype(cache["v"].dtype))
        for f in ("grp", "valid", "seg"):
            new[f] = cache[f].at[slots].set(pad_row(pcache[f]))
        last_hidden = last_hidden.at[slots].set(plast.astype(last_hidden.dtype))
        return new, last_hidden

    def _make_step(self):
        cfg, S, P = self.cfg, self.S, self.P
        eos, pad, temperature = self.eos, self.pad, self.temperature

        def step_k(params, cache, last_hidden, prompt_len, n_dec, done, cap, rng, k):
            def one(carry, r):
                cache, hid, n_dec, done = carry
                logits = lm_logits(params["llm"], cfg.llm, hid).astype(jnp.float32)
                if temperature and temperature > 0:
                    tok = jax.random.categorical(r, logits / temperature, axis=-1)
                else:
                    tok = jnp.argmax(logits, axis=-1)
                tok = jnp.where(done, pad, tok).astype(jnp.int32)

                emb = embed_tokens(params["llm"], cfg.llm, tok[:, None], dtype=hid.dtype)
                pos = (prompt_len + n_dec)[:, None]
                grp = pos + 1
                valid = jnp.where(done, 0, 1)[:, None].astype(jnp.int32)
                # done rows still index write_cols; their OOB column at the
                # capacity edge is dropped by XLA scatter semantics and the
                # write is valid=0 anyway
                hidden, cache = vlm_forward(
                    params, cfg, tok[:, None], valid, inputs_embeds=emb,
                    positions=pos, grp=grp, cache=cache, update_cache=True,
                    write_cols=P + n_dec,
                )
                n_dec = n_dec + jnp.where(done, 0, 1)
                new_done = done | (tok == eos) | (n_dec >= cap)
                return (cache, hidden[:, 0], n_dec, new_done), tok

            rngs = jax.random.split(rng, k)
            (cache, hid, n_dec, done), toks = jax.lax.scan(
                one, (cache, last_hidden, n_dec, done), rngs
            )
            return cache, hid, n_dec, done, toks  # toks [k, S]

        return step_k

    # ---- host loop --------------------------------------------------------

    def submit(self, ids, images=None, embeds=None, max_new: Optional[int] = None,
               timeout: float = 900.0) -> list:
        """Blocking: returns the generated token list (pads/eos trimmed)."""
        ids = np.asarray(ids).reshape(-1)
        if self._dead is not None:
            raise RuntimeError("decode engine is dead") from self._dead
        assert ids.shape[0] <= self.P, f"prompt {ids.shape[0]} > max_prompt {self.P}"
        r = _Request(ids=ids, images=images, embeds=embeds,
                     max_new=min(max_new or self.N, self.N))
        # stage the padded prompt + image on device from THIS thread (see
        # _Request): the engine loop then only stacks device arrays
        L = ids.shape[0]
        r.bucket = min(_bucket(max(L, 1)), self.P)
        pad_ids = np.zeros(r.bucket, np.int32)
        pad_ids[:L] = ids
        pad_valid = np.zeros(r.bucket, np.int32)
        pad_valid[:L] = 1
        r.ids_dev = jax.device_put(pad_ids)
        r.valid_dev = jax.device_put(pad_valid)
        if images is not None:
            r.images_dev = jax.device_put(np.asarray(images))
        if embeds is not None:
            # accept host OR device embeds ([L, H]); pad to the bucket on
            # device — a device-resident prompt (e.g. a NaVILA session's
            # fused history splice) never round-trips through the host
            e = embeds if isinstance(embeds, jax.Array) else jnp.asarray(embeds)
            r.embeds_dev = jnp.pad(e, ((0, r.bucket - L), (0, 0)))
        self._queue.put(r)
        self._wake.set()
        if not r.event.wait(timeout=timeout):
            raise TimeoutError("decode engine timed out")
        if r.error is not None:
            raise r.error
        return r.tokens

    def close(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)

    def _admit_batch(self, reqs: list, slots: list, bucket: int):
        """ONE padded prefill call + one cache scatter for a whole admission
        burst (requests grouped by compatible bucket/aux shapes): admitting
        a fleet's worth of queued requests costs one dispatch, not N."""
        import time as _time

        _t0 = _time.perf_counter()
        B = len(reqs)
        # stack the CLIENT-staged device rows — no host->device transfer on
        # this (the serving loop) thread; see _Request
        ids_d = jnp.stack([r.ids_dev for r in reqs])
        valid_d = jnp.stack([r.valid_dev for r in reqs])
        embeds = None
        if reqs[0].embeds_dev is not None:
            # caller's prefill dtype preserved (float32 matches the fused
            # generate() path bit-for-bit; pass bf16 embeds for bf16 serving)
            embeds = jnp.stack([r.embeds_dev for r in reqs])
        images = None
        if reqs[0].images_dev is not None:
            images = jnp.stack([r.images_dev for r in reqs])
        if self.chunk and self.chunk < bucket:
            # chunked admission: embed once, then feed the LLM prefill in
            # ``chunk``-token slices written DIRECTLY into the engine cache
            # (no separate prefill cache, no install scatter), with a decode
            # tick between slices so in-flight generations keep moving
            # during long prefills
            if embeds is None:
                embeds = self._embed_fn()(self.params, ids_d, images)
            lens = jnp.asarray([r.ids.shape[0] for r in reqs], jnp.int32)
            slots_arr = jnp.asarray(slots, jnp.int32)
            needed = int(max(r.ids.shape[0] for r in reqs))
            chunk_fn = self._chunk_fn()
            try:
                for s in slots:
                    self.n_dec[s] = 0  # stale decode depth parks tick
                    # writes of this not-yet-live row at column P+0
                epoch = self._epoch
                for off in range(0, needed, self.chunk):
                    c = min(self.chunk, bucket - off)
                    self.cache, self.last_hidden = chunk_fn(
                        self.params, embeds[:, off:off + c],
                        valid_d[:, off:off + c], np.int32(off), lens,
                        slots_arr, self.cache, self.last_hidden, off == 0,
                    )
                    if off + c < needed:
                        self._decode_tick()
                        if self._epoch != epoch:
                            # a failed tick reset the engine under us; the
                            # partial prompt chunks are gone
                            raise RuntimeError(
                                "engine state reset during chunked admission")
            except Exception as e:  # noqa: BLE001
                # clear/chunk donate the engine cache — a mid-execution
                # failure leaves it invalid, so in-flight slots are lost too
                self._fail_live(e)
                self._reset_state()
                raise
        else:
            fn = self._prefill(B, bucket, images is not None, embeds is not None)
            pcache, plast = fn(self.params, ids_d, valid_d, images, embeds)
            try:
                self.cache, self.last_hidden = self._install_fn(
                    self.cache, self.last_hidden, pcache, plast,
                    jnp.asarray(slots, jnp.int32),
                )
            except Exception as e:  # noqa: BLE001
                # install donates self.cache/last_hidden — a mid-execution
                # failure leaves them invalid, so in-flight slots are lost too
                self._fail_live(e)
                self._reset_state()
                raise
        for r, slot in zip(reqs, slots):
            self.prompt_len[slot] = r.ids.shape[0]
            self.n_dec[slot] = 0
            self.live[slot] = True
            self.reqs[slot] = r
            r.slot = slot
        if len(self.admit_log) < 65536:
            self.admit_log.append(
                (_t0, _time.perf_counter(), B, bucket,
                 bool(self.chunk and self.chunk < bucket)))

    def _loop(self):
        try:
            self._loop_inner()
        except Exception as e:  # noqa: BLE001
            # the loop thread must never die silently: mark the engine dead
            # so queued and future submits fail fast instead of hanging
            self._dead = e
            self._fail_live(e)
            while True:
                try:
                    r = self._queue.get_nowait()
                except queue.Empty:
                    break
                r.error = e
                r.event.set()

    def _loop_inner(self):
        while not self._stop:
            # admit queued requests into free slots — grouped by prefill
            # signature so each group is ONE batched prefill dispatch
            free = [s for s in range(self.S) if not self.live[s]]
            pending = []
            while len(pending) < len(free):
                try:
                    pending.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            if pending:
                groups: dict = {}
                for r in pending:
                    sig = (
                        r.bucket,
                        None if r.images_dev is None else r.images_dev.shape,
                        None if r.embeds_dev is None
                        else (r.embeds_dev.shape[-1], str(r.embeds_dev.dtype)),
                    )
                    groups.setdefault(sig, []).append(r)
                it = iter(free)
                for (bucket, _, _), reqs in groups.items():
                    slots = [next(it) for _ in reqs]
                    try:
                        self._admit_batch(reqs, slots, bucket)
                    except Exception as e:  # noqa: BLE001
                        for r in reqs:
                            r.error = e
                            r.event.set()
            if not self.live.any():
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            self._decode_tick()

    def _decode_tick(self):
        """One batched decode dispatch (``steps_per_tick`` tokens) for every
        live slot, then host-side retire.  Called from the engine loop and
        from inside chunked admissions (between prefill chunks)."""
        if not self.live.any():
            return
        if len(self.tick_times) < 65536:
            import time as _time

            self.tick_times.append(_time.perf_counter())
        if int(self.live.sum()) > 1:
            self.batched_steps += 1
        self.rng, r = jax.random.split(self.rng)
        done = jnp.asarray(~self.live | (self.n_dec >= self._max_new_arr()))
        try:
            self.cache, self.last_hidden, n_dec, done, toks = self._step_fn(
                self.params, self.cache, self.last_hidden,
                jnp.asarray(self.prompt_len), jnp.asarray(self.n_dec), done,
                jnp.asarray(self._max_new_arr()), r, self.k,
            )
            toks = np.asarray(jax.device_get(toks))  # [k, S]
            self.n_dec = np.array(jax.device_get(n_dec))  # writable copy
            done_np = np.asarray(jax.device_get(done))
        except Exception as e:  # noqa: BLE001
            # fail every in-flight request rather than hanging clients; the
            # step program donates the cache buffers, so after a failed
            # dispatch they may be invalid — rebuild a fresh empty engine
            # state before serving anything else
            self._fail_live(e)
            self._reset_state()  # raising here marks the engine dead (_loop)
            return
        for slot in range(self.S):
            req = self.reqs[slot]
            if req is None or not self.live[slot]:
                continue
            for t in toks[:, slot]:
                if len(req.tokens) >= req.max_new or (
                    req.tokens and req.tokens[-1] == self.eos
                ):
                    break
                req.tokens.append(int(t))
            finished = (
                done_np[slot]
                or len(req.tokens) >= req.max_new
                or (req.tokens and req.tokens[-1] == self.eos)
            )
            if finished:
                self.live[slot] = False
                self.reqs[slot] = None
                req.event.set()

    def _fail_live(self, e: Exception):
        for slot in range(self.S):
            req = self.reqs[slot]
            if req is not None:
                req.error = e
                self.live[slot] = False
                self.reqs[slot] = None
                req.event.set()

    def _reset_state(self):
        self._epoch += 1
        C = self.P + self.N
        self.cache = init_kv_cache(self.cfg.llm, self.S, C, dtype=jnp.bfloat16)
        self.last_hidden = jnp.zeros(
            (self.S, self.cfg.llm.hidden_size), jnp.bfloat16)

    def _max_new_arr(self):
        out = np.full(self.S, self.N, np.int32)
        for slot, req in enumerate(self.reqs):
            if req is not None:
                out[slot] = req.max_new
        return out
