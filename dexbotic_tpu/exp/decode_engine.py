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

Optional ``prefill_chunk``: admission feeds the prompt through the prefill
cache ``chunk`` tokens at a time (embed/ViT one dispatch up front; each LLM
chunk writes k/v at its column range via write_cols and lets grp/positions
auto-continue from the cache's valid count) and runs one decode tick for
the already-live slots between chunks — a long prefill no longer stalls
in-flight generations for its whole duration (vLLM-style chunked prefill,
expressed with static shapes).
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

        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._prefill_fns: dict = {}
        self._step_fn = jax.jit(self._make_step(), static_argnums=(8,))
        self._install_fn = jax.jit(self._install)
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
        """One prefill chunk: run ``emb[:, off:off+c]`` against the partial
        prefill cache (vlm_forward auto-continues grp/positions from the
        cache's valid count), write k/v at columns off..off+c-1 via
        write_cols, and keep the running last-valid hidden state."""
        fn = getattr(self, "_chunk_jit", None)
        if fn is None:
            cfg = self.cfg

            def chunk(params, emb, valid, off, lens, cache, last):
                B, c = emb.shape[:2]
                hidden, cache = vlm_forward(
                    params, cfg, jnp.zeros((B, c), jnp.int32), valid,
                    inputs_embeds=emb, cache=cache, update_cache=True,
                    write_cols=jnp.full((B,), off, jnp.int32),
                )
                rel = jnp.clip(lens - 1 - off, 0, c - 1)
                cand = jnp.take_along_axis(hidden, rel[:, None, None], axis=1)[:, 0]
                in_chunk = (lens - 1 >= off) & (lens - 1 < off + c)
                last = jnp.where(in_chunk[:, None], cand.astype(last.dtype), last)
                return cache, last

            fn = self._chunk_jit = jax.jit(chunk)
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
        assert ids.shape[0] <= self.P, f"prompt {ids.shape[0]} > max_prompt {self.P}"
        r = _Request(ids=ids, images=images, embeds=embeds,
                     max_new=min(max_new or self.N, self.N))
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
        B = len(reqs)
        ids = np.zeros((B, bucket), np.int32)
        valid = np.zeros((B, bucket), np.int32)
        for i, r in enumerate(reqs):
            L = r.ids.shape[0]
            ids[i, :L] = r.ids
            valid[i, :L] = 1
        embeds = None
        if reqs[0].embeds is not None:
            # keep the caller's prefill dtype (float32 matches the fused
            # generate() path bit-for-bit; pass bf16 embeds for bf16 serving)
            embeds = np.zeros((B, bucket, reqs[0].embeds.shape[-1]),
                              reqs[0].embeds.dtype)
            for i, r in enumerate(reqs):
                embeds[i, : r.ids.shape[0]] = r.embeds
            embeds = jnp.asarray(embeds)
        images = None
        if reqs[0].images is not None:
            images = jnp.asarray(np.stack([np.asarray(r.images) for r in reqs]))
        if self.chunk and self.chunk < bucket:
            # chunked admission: embed once, then feed the LLM prefill in
            # ``chunk``-token slices with a decode tick between slices so
            # in-flight generations keep moving during long prefills
            if embeds is None:
                embeds = self._embed_fn()(self.params, jnp.asarray(ids), images)
            pcache = init_kv_cache(self.cfg.llm, B, bucket, dtype=jnp.bfloat16)
            plast = jnp.zeros((B, self.cfg.llm.hidden_size), jnp.bfloat16)
            lens = jnp.asarray([r.ids.shape[0] for r in reqs], jnp.int32)
            needed = int(max(r.ids.shape[0] for r in reqs))
            chunk_fn = self._chunk_fn()
            for off in range(0, needed, self.chunk):
                c = min(self.chunk, bucket - off)
                pcache, plast = chunk_fn(
                    self.params, embeds[:, off:off + c],
                    jnp.asarray(valid[:, off:off + c]), np.int32(off), lens,
                    pcache, plast,
                )
                if off + c < needed:
                    self._decode_tick()
        else:
            fn = self._prefill(B, bucket, images is not None, embeds is not None)
            pcache, plast = fn(self.params, jnp.asarray(ids), jnp.asarray(valid),
                               images, embeds)
        self.cache, self.last_hidden = self._install_fn(
            self.cache, self.last_hidden, pcache, plast,
            jnp.asarray(slots, jnp.int32),
        )
        for r, slot in zip(reqs, slots):
            self.prompt_len[slot] = r.ids.shape[0]
            self.n_dec[slot] = 0
            self.live[slot] = True
            self.reqs[slot] = r
            r.slot = slot

    def _loop(self):
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
                    bucket = min(_bucket(max(r.ids.shape[0], 1)), self.P)
                    sig = (
                        bucket,
                        None if r.images is None else np.asarray(r.images).shape,
                        None if r.embeds is None else r.embeds.shape[-1],
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
            # fail every in-flight request rather than hanging clients
            for slot in range(self.S):
                req = self.reqs[slot]
                if req is not None:
                    req.error = e
                    self.live[slot] = False
                    self.reqs[slot] = None
                    req.event.set()
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

    def _max_new_arr(self):
        out = np.full(self.S, self.N, np.int32)
        for slot, req in enumerate(self.reqs):
            if req is not None:
                out[slot] = req.max_new
        return out
