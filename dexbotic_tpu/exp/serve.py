"""HTTP action server: POST /process_frame -> JSON action chunk.

Protocol-compatible with the reference's Flask server
(/root/reference/dexbotic/exp/base_exp.py:619-759): multipart form with
'text' prompt, image file parts, optional 'states'/'batch_size'; response is
a JSON [chunk_size x action_dim] list.  Implemented on stdlib http.server
(Flask is not in this image); the model path is one jitted frame->chunk
program.
"""

from __future__ import annotations

import io
import json
import threading
import time
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dexbotic_tpu.data.image_processing import preprocess_images_batch, to_numpy_image
from dexbotic_tpu.tokenization import conversation as conversation_lib
from dexbotic_tpu.tokenization.tokenize import tokenizer_image_token


def _disposition_param(header: str, key: str):
    """name/filename out of a Content-Disposition line (quoted or bare)."""
    m = re.search(rf'{key}="((?:[^"\\]|\\.)*)"', header) or re.search(
        rf"{key}=([^;\r\n]+)", header
    )
    return m.group(1).replace('\\"', '"') if m else None


def parse_multipart(headers: dict, body: bytes):
    """Parse a multipart/form-data body -> (fields: dict, files: list).

    Direct byte-level boundary split: email.BytesParser costs ~50 ms on a
    single 900 KB camera frame (measured; it dominates the whole device
    compute at B=1), this is <1 ms.  Frame payloads are returned as
    zero-copy-ish slices of the request body."""
    ctype = headers.get("Content-Type", headers.get("content-type", ""))
    if not ctype.startswith("multipart/form-data"):
        try:
            return json.loads(body.decode() or "{}"), []
        except json.JSONDecodeError:
            return {}, []
    m = re.search(r'boundary="?([^";,]+)"?', ctype)
    if not m:
        return {}, []
    delim = b"--" + m.group(1).encode()
    fields, files = {}, []
    # parts live between boundary markers; the final marker is delim + b"--"
    pos = body.find(delim)
    while pos != -1:
        pos += len(delim)
        if body.startswith(b"--", pos):
            break
        # skip the CRLF after the boundary line
        if body.startswith(b"\r\n", pos):
            pos += 2
        elif body.startswith(b"\n", pos):
            pos += 1
        nxt = body.find(delim, pos)
        part = body[pos : (nxt if nxt != -1 else len(body))]
        pos = nxt
        sep = part.find(b"\r\n\r\n")
        off = 4
        if sep == -1:
            sep = part.find(b"\n\n")
            off = 2
        if sep == -1:
            continue
        head = part[:sep].decode("utf-8", "replace")
        payload = part[sep + off :]
        # strip the trailing CRLF that precedes the next boundary line
        if payload.endswith(b"\r\n"):
            payload = payload[:-2]
        elif payload.endswith(b"\n"):
            payload = payload[:-1]
        name = _disposition_param(head, "name")
        filename = _disposition_param(head, "filename")
        if filename:
            files.append((name, payload))
        else:
            fields[name] = payload.decode()
    return fields, files


class ServingStats:
    """Serving-side state-normalize / action-denormalize, mirroring the
    reference's ActionNorm/ActionDenorm pipelines bit-for-bit
    (/root/reference/dexbotic/data/dataset/transform/action.py:250-278,
    output.py:123-163 and exp/pi0_exp.py:363-376): ``use_quantiles`` picks
    (x-min)/(max-min+1e-6)*2-1 vs (x-mean)/(std+1e-6); denorm pads stats to
    the data width with identity values and does NOT clip."""

    def __init__(self, mapping, use_quantiles: bool):
        self.mapping = mapping if isinstance(mapping, dict) else {}
        self.use_quantiles = use_quantiles

    def has(self, key: str) -> bool:
        return isinstance(self.mapping.get(key), dict)

    def _st(self, key, names, width=None):
        st = [np.asarray(self.mapping[key][n], np.float64).reshape(-1) for n in names]
        if width is not None:  # identity-pad to the data width (output.py:141-163)
            fill = {"min": -1.0, "max": 1.0, "mean": 0.0, "std": 1.0}
            st = [
                np.concatenate([v, np.full(width - v.shape[-1], fill[n])])
                if v.shape[-1] < width else v
                for n, v in zip(names, st)
            ]
        return st

    def normalize(self, key: str, x: np.ndarray) -> np.ndarray:
        if not self.has(key):
            return x
        if self.use_quantiles:
            lo, hi = self._st(key, ("min", "max"))
            return ((x - lo) / (hi - lo + 1e-6) * 2.0 - 1.0).astype(np.float32)
        mean, std = self._st(key, ("mean", "std"))
        return ((x - mean) / (std + 1e-6)).astype(np.float32)

    def denormalize(self, key: str, x: np.ndarray) -> np.ndarray:
        if not self.has(key):
            return x
        if self.use_quantiles:
            lo, hi = self._st(key, ("min", "max"), width=x.shape[-1])
            return (x + 1.0) / 2.0 * (hi - lo + 1e-6) + lo
        mean, std = self._st(key, ("mean", "std"), width=x.shape[-1])
        return x * (std + 1e-6) + mean


def _cogact_prompt_ids(exp, cfg, tokenizer, prompt: str, assistant_stub=" ") -> list:
    """Raw request text -> token ids with image placeholders expanded.

    Byte-exact mirror of the reference's action-policy serving paths
    (exp/cogact_exp.py:156-167, oft_exp.py:177-179, memvla_exp.py:334-336):
    '<image>\\n' + text -> conversation template with a ``' '`` assistant
    stub — so the prompt ends ``'ASSISTANT:  ' + sep2``, NOT ``'ASSISTANT:'``
    — then tokenizer_image_token.  AR text policies use ``assistant_stub=None``
    (discrete_vla_exp.py:115-117).  A configured '{prompt}'-style template is
    applied first (client convenience; the reference's benchmark clients send
    the already-templated question and its server only prepends the image
    token).
    """
    template = exp.action.prompt_template
    text = template.format(prompt=prompt) if "{prompt}" in template else prompt
    if "<image>" not in text:
        text = "<image>\n" + text
    conv = conversation_lib.conv_templates[exp.tokenizer.chat_template].copy()
    conv.append_message(conv.roles[0], text)
    conv.append_message(conv.roles[1], assistant_stub)
    full = conv.get_prompt()
    return tokenizer_image_token(
        full, tokenizer, num_image_tokens=cfg.vlm.num_image_tokens
    )


def _decode_frames(payloads) -> tuple[list, str]:
    """Raw multipart payloads / arrays / PIL images -> (uint8 HWC arrays,
    channel order).

    cv2.imdecode is ~1.3x PIL on PNG camera frames and the serving hot path
    is host-bound (decode > preprocess > device program; BENCH_NOTES p50
    section), so prefer it — its BGR output is NOT copied here: the fused
    preprocessing kernel folds the channel reorder into its own float
    conversion (channel_order='bgr')."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        cv2 = None

    out, orders = [], []
    for p in payloads:
        if isinstance(p, (np.ndarray, Image.Image)):
            out.append(to_numpy_image(p))
            orders.append("rgb")
            continue
        img = None
        if cv2 is not None:
            img = cv2.imdecode(np.frombuffer(p, np.uint8), cv2.IMREAD_COLOR)
        if img is not None:
            out.append(img)
            orders.append("bgr")
        else:
            out.append(to_numpy_image(Image.open(io.BytesIO(p))))
            orders.append("rgb")
    if len(set(orders)) > 1:  # mixed sources: normalize to RGB up front
        out = [a[:, :, ::-1] if o == "bgr" else a for a, o in zip(out, orders)]
        return out, "rgb"
    return out, orders[0] if orders else "rgb"


def _cogact_images(payloads, proc) -> np.ndarray:
    """Decode -> fused pad-to-square + processor, batched over all frames
    (native C++ kernel when frames share a shape; cv2 fallback)."""
    fill = tuple(int(x * 255) for x in proc.mean)
    frames, order = _decode_frames(payloads)
    return preprocess_images_batch(frames, proc, pad_fill=fill, channel_order=order)


def prepare_cogact_inputs(exp, cfg, tokenizer, images, prompt: str):
    """Images + raw task prompt -> (input_ids, valid, images) device arrays
    (batch of 1); image pad-to-square -> processor."""
    ids = _cogact_prompt_ids(exp, cfg, tokenizer, prompt)
    input_ids = jnp.asarray(ids, jnp.int32)[None]
    valid = jnp.ones(input_ids.shape, jnp.int32)
    proc = exp.data.build_image_processor()
    imgs = jnp.asarray(_cogact_images(images, proc))[None]
    return input_ids, valid, imgs


class ActionServer:
    """Generic one-model action server; subclass provides get_response().

    save_image_dir: when set, dumps each request's frames + response JSON
    under sequentially-numbered files (the reference's debug episode dumps,
    exp/base_exp.py:715-735).

    micro_batch > 1 enables dynamic request coalescing (a TPU-native
    extension; the reference serves strictly sequentially, Flask
    threaded=False at base_exp.py:652-653): concurrent single-frame requests
    arriving within ``micro_batch_window_ms`` of each other are padded to
    one fixed batch shape and served by ONE device call — batched inference
    measured ~3x the B=1 rate at 1b (BENCH_NOTES), and a fleet of robot
    clients hits exactly this pattern.  Padding to the fixed ``micro_batch``
    bounds the batch dimension to two sizes (B=1 and B=micro_batch); token
    length is padded to 64-wide buckets (_infer_rows), so the compiled-shape
    count stays small even as distinct prompt lengths arrive."""

    def __init__(self, host: str = "0.0.0.0", port: int = 7891,
                 save_image_dir: str | None = None,
                 micro_batch: int = 0, micro_batch_window_ms: float = 5.0,
                 micro_batch_timeout_s: float = 900.0):
        self.host, self.port = host, port
        self.save_image_dir = save_image_dir
        self._dump_idx = 0
        # ThreadingHTTPServer handles requests concurrently but model state
        # (self.rng splits, _dump_idx) is mutable: serialize request handling
        # (the reference serves threaded=False, base_exp.py:652-653)
        import threading

        self._lock = threading.Lock()
        self.micro_batch = int(micro_batch)
        self.micro_batch_window_ms = float(micro_batch_window_ms)
        # generous: the FIRST request blocks on the jit compile (minutes on
        # some toolchains); later requests are at inference latency
        self.micro_batch_timeout_s = float(micro_batch_timeout_s)
        self.batched_calls = 0  # observability: coalesced device calls
        self._mb_queue = None
        if self.micro_batch > 1:
            import queue

            self._mb_queue = queue.Queue()
            t = threading.Thread(target=self._micro_batch_worker, daemon=True)
            t.start()

    # ---- dynamic micro-batching ------------------------------------------

    def get_batched_response(self, requests: list) -> list:
        """Serve a list of coalesced single requests [(fields, files), ...].

        Base implementation: sequential fallback (correct for any server);
        CogActServer overrides with a true one-device-call batch."""
        return [self.get_response(f, fl) for f, fl in requests]

    def _micro_batch_worker(self):
        import queue

        window = self.micro_batch_window_ms / 1e3
        while True:
            batch = [self._mb_queue.get()]
            deadline = time.monotonic() + window
            while len(batch) < self.micro_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._mb_queue.get(timeout=remaining))
                except queue.Empty:
                    break
            with self._lock:
                try:
                    if len(batch) > 1:
                        self.batched_calls += 1
                    results = self.get_batched_response(
                        [(b["fields"], b["files"]) for b in batch]
                    )
                    assert len(results) == len(batch), (
                        f"get_batched_response returned {len(results)} results "
                        f"for {len(batch)} requests"
                    )
                    for b, r in zip(batch, results):
                        self._maybe_dump(b["fields"], b["files"], r)
                        b["result"] = r
                except Exception as e:  # noqa: BLE001
                    if len(batch) == 1:
                        batch[0]["error"] = e
                    else:
                        # One malformed request (corrupt image, bad 'states')
                        # must not 500 every coalesced client: retry each
                        # request individually so only the offender errors.
                        for b in batch:
                            try:
                                r = self.get_response(b["fields"], b["files"])
                                self._maybe_dump(b["fields"], b["files"], r)
                                b["result"] = r
                            except Exception as e_one:  # noqa: BLE001
                                b["error"] = e_one
            for b in batch:
                b["event"].set()

    def _submit_single(self, fields, files):
        import threading

        box = {"fields": fields, "files": files, "event": threading.Event()}
        self._mb_queue.put(box)
        if not box["event"].wait(timeout=self.micro_batch_timeout_s):
            raise TimeoutError(
                f"micro-batch worker exceeded {self.micro_batch_timeout_s}s "
                "(first request includes the jit compile)"
            )
        if "error" in box:
            raise box["error"]
        return box["result"]

    def _maybe_dump(self, fields, files, result):
        if not self.save_image_dir:
            return
        import os

        os.makedirs(self.save_image_dir, exist_ok=True)
        i = self._dump_idx
        self._dump_idx += 1
        for j, (_, payload) in enumerate(files):
            with open(f"{self.save_image_dir}/frame_{i:06d}_{j}.png", "wb") as f:
                f.write(payload)
        with open(f"{self.save_image_dir}/resp_{i:06d}.json", "w") as f:
            json.dump({"fields": fields, "result": result}, f)

    def get_response(self, fields: dict, files: list) -> dict:
        raise NotImplementedError

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path.rstrip("/") != "/process_frame":
                    self.send_error(404)
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                t0 = time.monotonic()
                try:
                    fields, files = parse_multipart(dict(self.headers), body)
                    single = int(fields.get("batch_size", 1)) == 1
                    if server_self._mb_queue is not None and single:
                        result = server_self._submit_single(fields, files)
                    elif getattr(server_self, "concurrent", False):
                        # server synchronizes internally (continuous-batching
                        # decode engine): requests must REACH it concurrently
                        # for decode steps to coalesce
                        result = server_self.get_response(fields, files)
                        with server_self._lock:
                            server_self._maybe_dump(fields, files, result)
                    else:
                        with server_self._lock:
                            result = server_self.get_response(fields, files)
                            server_self._maybe_dump(fields, files, result)
                    payload = json.dumps(result).encode()
                    self.send_response(200)
                except Exception as e:  # noqa: BLE001
                    payload = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.send_header("X-Inference-Time", f"{time.monotonic() - t0:.4f}")
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args):
                pass

        return Handler

    def run(self):
        httpd = ThreadingHTTPServer((self.host, self.port), self.make_handler())
        print(f"action server listening on {self.host}:{self.port}")
        httpd.serve_forever()

    def serve_background(self):
        import threading

        httpd = ThreadingHTTPServer((self.host, self.port), self.make_handler())
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd


class CogActServer(ActionServer):
    """``fuse_preprocess=True`` moves pad-to-square + PIL-parity resize +
    normalize ONTO the device (ops/image_ops.py: separable resample as two
    einsums): the host only decodes the frame bytes and uploads raw uint8,
    and the whole frame->chunk path is one jitted program (SURVEY §2.9
    north star).  Falls back to the host C++ kernel when a request's frames
    have mixed shapes (one compiled program per camera geometry)."""

    def __init__(self, exp, cfg, params, tokenizer, norms, host="0.0.0.0", port=7891,
                 micro_batch: int = 0, micro_batch_window_ms: float = 5.0,
                 fuse_preprocess: bool = False):
        super().__init__(host, port, micro_batch=micro_batch,
                         micro_batch_window_ms=micro_batch_window_ms)
        self.exp, self.cfg, self.tokenizer, self.norms = exp, cfg, tokenizer, norms
        self.infer = exp.make_infer_fn(cfg, params)
        self.rng = jax.random.PRNGKey(0)
        self._prompt_cache: dict = {}
        self.fuse_preprocess = fuse_preprocess
        self._params = params
        self._raw_infer: dict = {}

    def _raw_infer_fn(self, in_hw: tuple, order: str, per: int):
        """One jitted uint8-frames->chunk program per camera geometry."""
        key = (in_hw, order, per)
        fn = self._raw_infer.get(key)
        if fn is None:
            from dexbotic_tpu.models.cogact import cogact_inference_action
            from dexbotic_tpu.ops.image_ops import make_device_preprocess

            proc = self.exp.data.build_image_processor()
            fill = tuple(int(x * 255) for x in proc.mean)
            prep = make_device_preprocess(
                in_hw, proc.size, resample=proc.resample, mean=proc.mean,
                std=proc.std, rescale=proc.rescale, pad_to_square=True,
                fill=fill,
            )
            cfg = self.cfg

            @jax.jit
            def _raw(params, ids, valid, raw_u8, r):
                x = raw_u8[..., ::-1] if order == "bgr" else raw_u8
                imgs = prep(x)
                B = ids.shape[0]
                imgs = imgs.reshape(B, per, *imgs.shape[1:])
                return cogact_inference_action(params, cfg, ids, valid, imgs, r)

            fn = self._raw_infer[key] = (
                lambda ids, valid, raw, r: _raw(self._params, ids, valid, raw, r)
            )
        return fn

    def _prompt_ids(self, prompt: str) -> list:
        # robot loops re-send the same instruction every frame; cache the
        # template + tokenize work (requests are serialized by _lock)
        cache = getattr(self, "_prompt_cache", None)
        if cache is None:
            cache = self._prompt_cache = {}
        ids = cache.get(prompt)
        if ids is None:
            ids = _cogact_prompt_ids(self.exp, self.cfg, self.tokenizer, prompt)
            if len(cache) < 1024:
                cache[prompt] = ids
        return ids

    def _denorm(self, out: np.ndarray) -> np.ndarray:
        if self.norms is None:
            return out
        # numpy denorm: same math as denorm_actions (models/cogact.py)
        # without a jax dispatch on a [B, chunk, dim] host array
        lo = np.asarray(self.norms["min"], np.float64)
        hi = np.asarray(self.norms["max"], np.float64)
        a = np.clip(out[..., : len(lo)], -1.0, 1.0)
        return np.concatenate(
            [lo + (a + 1.0) * 0.5 * (hi - lo), out[..., len(lo):]], axis=-1
        )

    def _infer_rows(self, prompts, payload_groups, pad_to=None):
        """Run one batched device call over B rows (prompt + view-group each).

        ``pad_to`` pads the batch by repeating row 0 so coalesced dynamic
        batches reuse ONE compiled shape; padded rows are sliced off."""
        B = len(prompts)
        Bp = max(pad_to or B, B)
        if Bp > B:
            prompts = list(prompts) + [prompts[0]] * (Bp - B)
            payload_groups = list(payload_groups) + [payload_groups[0]] * (Bp - B)
        per = len(payload_groups[0])
        assert all(len(g) == per for g in payload_groups), "ragged view groups"

        rows = [self._prompt_ids(p) for p in prompts]
        # Bucket token length to multiples of 64: padding to the exact batch
        # max would trigger a fresh XLA compile (minutes through the axon
        # tunnel, with queued requests blocked on the lock) for every new
        # max-L; bucketing bounds the compiled-shape count.
        L = -(-max(len(r) for r in rows) // 64) * 64
        ids_np = np.zeros((Bp, L), np.int32)
        valid_np = np.zeros((Bp, L), np.int32)
        for b, r in enumerate(rows):
            ids_np[b, : len(r)] = r
            valid_np[b, : len(r)] = 1

        self.rng, r = jax.random.split(self.rng)
        flat_payloads = [p for g in payload_groups for p in g]
        if self.fuse_preprocess:
            frames, order = _decode_frames(flat_payloads)
            if len({f.shape for f in frames}) == 1:
                raw = jnp.asarray(np.stack(frames))  # [Bp*per, H, W, 3] uint8
                fn = self._raw_infer_fn(tuple(frames[0].shape[:2]), order, per)
                out = np.asarray(jax.device_get(fn(
                    jnp.asarray(ids_np), jnp.asarray(valid_np), raw, r
                )))
                return self._denorm(out)[:B]
            # mixed frame shapes: fall through to the host kernel
        proc = self.exp.data.build_image_processor()
        flat = _cogact_images(flat_payloads, proc)  # [Bp*per, size, size, 3]
        imgs_np = flat.reshape(Bp, per, *flat.shape[1:])
        out = np.asarray(
            jax.device_get(
                self.infer(
                    jnp.asarray(ids_np), jnp.asarray(valid_np), jnp.asarray(imgs_np), r
                )
            )
        )
        return self._denorm(out)[:B]

    def get_response(self, fields, files):
        """Single or batched requests: with 'batch_size'=B the posted images
        are B view-groups in order and 'text' may carry B semicolon-separated
        prompts (one prompt replicates across rows); token rows are padded to
        a common length with valid=0 tails."""
        prompt = fields.get("text", "")
        B = int(fields.get("batch_size", 1))
        prompts = prompt.split(";") if ";" in prompt else [prompt] * B
        assert len(prompts) == B, f"{len(prompts)} prompts for batch_size {B}"
        payloads = [payload for _, payload in files]
        assert len(payloads) % B == 0, (
            f"{len(payloads)} images not divisible by batch_size {B}"
        )
        per = len(payloads) // B
        groups = [payloads[i * per : (i + 1) * per] for i in range(B)]
        out = self._infer_rows(prompts, groups)
        return out[0].tolist() if B == 1 else out.tolist()

    def get_batched_response(self, requests):
        """Coalesced single requests -> one padded device call per view-count
        group (static shapes: the batch pads to micro_batch)."""
        results = [None] * len(requests)
        by_per: dict = {}
        for i, (fields, files) in enumerate(requests):
            payloads = [p for _, p in files]
            by_per.setdefault(len(payloads), []).append((i, fields, payloads))
        for per, items in by_per.items():
            prompts = [f.get("text", "") for _, f, _ in items]
            groups = [g for _, _, g in items]
            pad_to = self.micro_batch if len(items) > 1 else None
            out = self._infer_rows(prompts, groups, pad_to=pad_to)
            for k, (i, _, _) in enumerate(items):
                results[i] = out[k].tolist()
        return results


class OFTServer(CogActServer):
    """OFT serving: the CogACT request contract plus an optional 'states'
    form field carrying a JSON proprio vector, reshaped to one row
    (/root/reference/dexbotic/exp/oft_exp.py:164-199).  Batched requests
    carry B semicolon-separated JSON states."""

    def _states(self, raws, B) -> np.ndarray:
        dim = self.cfg.proprio_dim if self.cfg.use_proprio else 1
        s = np.zeros((B, dim), np.float32)
        for b, raw in enumerate(raws[:B]):
            if raw:
                vals = np.asarray(json.loads(raw), np.float32).reshape(-1)
                s[b, : min(len(vals), dim)] = vals[:dim]
        return s

    def _infer_rows(self, prompts, payload_groups, pad_to=None, states=None):
        B = len(prompts)
        Bp = max(pad_to or B, B)
        if states is None:
            states = self._states([None] * B, B)
        if Bp > B:
            prompts = list(prompts) + [prompts[0]] * (Bp - B)
            payload_groups = list(payload_groups) + [payload_groups[0]] * (Bp - B)
            states = np.concatenate([states, np.repeat(states[:1], Bp - B, axis=0)], 0)
        per = len(payload_groups[0])
        assert all(len(g) == per for g in payload_groups), "ragged view groups"

        rows = [self._prompt_ids(p) for p in prompts]
        L = -(-max(len(r) for r in rows) // 64) * 64  # 64-wide length buckets
        ids_np = np.zeros((Bp, L), np.int32)
        valid_np = np.zeros((Bp, L), np.int32)
        for b, r in enumerate(rows):
            ids_np[b, : len(r)] = r
            valid_np[b, : len(r)] = 1

        proc = self.exp.data.build_image_processor()
        flat = _cogact_images([p for g in payload_groups for p in g], proc)
        imgs_np = flat.reshape(Bp, per, *flat.shape[1:])
        self.rng, r = jax.random.split(self.rng)
        out = np.asarray(
            jax.device_get(
                self.infer(
                    jnp.asarray(ids_np), jnp.asarray(valid_np),
                    jnp.asarray(imgs_np), jnp.asarray(states), r,
                )
            )
        )
        return self._denorm(out)[:B]

    def get_response(self, fields, files):
        prompt = fields.get("text", "")
        B = int(fields.get("batch_size", 1))
        prompts = prompt.split(";") if ";" in prompt else [prompt] * B
        payloads = [p for _, p in files]
        per = len(payloads) // B
        groups = [payloads[i * per : (i + 1) * per] for i in range(B)]
        raw_states = (fields.get("states") or "").split(";")
        states = self._states(
            [raw_states[b] if b < len(raw_states) else None for b in range(B)], B
        )
        out = self._infer_rows(prompts, groups, states=states)
        return out[0].tolist() if B == 1 else out.tolist()

    def get_batched_response(self, requests):
        results = [None] * len(requests)
        by_per: dict = {}
        for i, (fields, files) in enumerate(requests):
            payloads = [p for _, p in files]
            by_per.setdefault(len(payloads), []).append((i, fields, payloads))
        for per, items in by_per.items():
            prompts = [f.get("text", "") for _, f, _ in items]
            groups = [g for _, _, g in items]
            states = self._states([f.get("states") for _, f, _ in items], len(items))
            pad_to = self.micro_batch if len(items) > 1 else None
            out = self._infer_rows(prompts, groups, pad_to=pad_to, states=states)
            for k, (i, _, _) in enumerate(items):
                results[i] = out[k].tolist()
        return results


class MemVLAServer(ActionServer):
    """Stateful MemVLA serving (memvla_exp.py:309-358): the CogACT request
    contract plus a REQUIRED 'episode_first_frame' field ('True'|'False');
    'True' resets the memory bank.  Requests are strictly serialized by the
    base class lock — the bank is cross-request state, so no micro-batching."""

    def __init__(self, exp, cfg, params, tokenizer, norms,
                 host="0.0.0.0", port=7891):
        super().__init__(host, port)
        from dexbotic_tpu.exp.memvla_exp import MemVLAInferenceSession

        self.exp, self.cfg, self.tokenizer, self.norms = exp, cfg, tokenizer, norms
        self.session = MemVLAInferenceSession(exp, cfg, params, batch_size=1)
        self.rng = jax.random.PRNGKey(0)
        self._prompt_cache: dict = {}

    _prompt_ids = CogActServer._prompt_ids
    _denorm = CogActServer._denorm

    def get_response(self, fields, files):
        eff = fields.get("episode_first_frame")
        assert eff in ("True", "False"), (
            "episode_first_frame must be 'True' or 'False' (memvla_arch.py:677)"
        )
        if eff == "True":
            self.session.reset()
        ids = self._prompt_ids(fields.get("text", ""))
        proc = self.exp.data.build_image_processor()
        imgs = _cogact_images([p for _, p in files], proc)[None]
        self.rng, r = jax.random.split(self.rng)
        out = np.asarray(
            jax.device_get(
                self.session.step(
                    jnp.asarray(np.asarray(ids, np.int32))[None],
                    jnp.ones((1, len(ids)), jnp.int32),
                    jnp.asarray(imgs), r,
                )
            )
        )
        return self._denorm(out)[0].tolist()


class MUVLAServer(ActionServer):
    """Map-understanding VLA serving: first posted image is the MAP view,
    the rest are observation views (current + history); responds with the
    generated action text (muvla_arch.py:609-682 AR path).

    ``continuous_batching`` > 0 serves the AR decode through the slot-based
    ContinuousBatchingEngine (exp/decode_engine.py) instead of one fused
    generate per request: concurrent requests coalesce at decode-step
    granularity and the per-request fuse/prefill stays pipelined."""

    def __init__(self, exp, cfg, params, tokenizer, host="0.0.0.0", port=7891,
                 max_new_tokens: int = 32, continuous_batching: int = 0,
                 prefill_chunk: int = 0):
        super().__init__(host, port)
        self.exp, self.cfg, self.tokenizer = exp, cfg, tokenizer
        self.max_new_tokens = max_new_tokens
        self.gen = exp.make_generate_fn(
            cfg, params, max_new_tokens=max_new_tokens,
            eos_token_id=getattr(tokenizer, "eos_token_id", 0) or 0)
        self.rng = jax.random.PRNGKey(0)
        self._rng_lock = threading.Lock()
        self.engine = None
        if continuous_batching > 0:
            from dexbotic_tpu.exp.decode_engine import ContinuousBatchingEngine
            from dexbotic_tpu.models.muvla import fuse_obs_with_history
            from dexbotic_tpu.models.vlm import splice_image_embeds

            self.concurrent = True  # handler skips the global lock

            @jax.jit
            def _embeds(params, ids, map_img, obs_imgs):
                tokens = fuse_obs_with_history(params, cfg, map_img, obs_imgs)
                return splice_image_embeds(
                    {"llm": params["llm"]}, cfg.vlm, ids, tokens
                )

            self._embed_fn = lambda ids, m, o: _embeds(params, ids, m, o)
            self.engine = ContinuousBatchingEngine(
                params, cfg.vlm, slots=continuous_batching,
                max_new=max_new_tokens,
                eos_token_id=getattr(tokenizer, "eos_token_id", 0) or 0,
                prefill_chunk=prefill_chunk or None,
            )

    def _prepare(self, fields, files):
        prompt = fields.get("text", "")
        payloads = [p for _, p in files]
        assert len(payloads) >= 2, "MUVLA needs a map view + >=1 obs view"
        proc = self.exp.data.build_image_processor()
        map_f, map_o = _decode_frames(payloads[:1])
        obs_f, obs_o = _decode_frames(payloads[1:])
        map_img = jnp.asarray(preprocess_images_batch(map_f, proc, channel_order=map_o))
        obs = jnp.asarray(preprocess_images_batch(obs_f, proc, channel_order=obs_o))[None]
        nt = self.cfg.num_fused_tokens(obs.shape[1])
        # reference prompt construction (exp/muvla_exp.py:211-215): the
        # conversation template wraps DEFAULT_IMAGE_TOKEN + text (no '\n'),
        # assistant slot left empty (AR policy)
        conv = conversation_lib.conv_templates[self.exp.tokenizer.chat_template].copy()
        conv.append_message(conv.roles[0], "<image>" + prompt)
        conv.append_message(conv.roles[1], None)
        ids = tokenizer_image_token(
            conv.get_prompt(), self.tokenizer, num_image_tokens=nt
        )
        input_ids = jnp.asarray(ids, jnp.int32)[None]
        return input_ids, map_img, obs

    def _decode_tokens(self, toks: list) -> dict:
        # reference postprocess (muvla_exp.py:232-234): decode, strip the
        # sep2 stop string, strip whitespace
        eos = getattr(self.tokenizer, "eos_token_id", 0) or 0
        if eos in toks:
            toks = toks[: toks.index(eos)]
        text = self.tokenizer.decode(toks)
        conv = conversation_lib.conv_templates[self.exp.tokenizer.chat_template]
        sep2 = getattr(conv, "sep2", None)
        if sep2:
            text = text.replace(sep2, "")
        return {"text": text.strip()}

    def get_response(self, fields, files):
        input_ids, map_img, obs = self._prepare(fields, files)
        if self.engine is not None:
            embeds = self._embed_fn(input_ids, map_img, obs)
            # device-resident handoff: the engine pads/stacks on device, so
            # the ~MB prompt embeds never round-trip through the host tunnel
            toks = self.engine.submit(
                np.asarray(input_ids)[0],
                embeds=embeds[0].astype(jnp.float32),
                max_new=self.max_new_tokens,
            )
            return self._decode_tokens(toks)
        valid = jnp.ones(input_ids.shape, jnp.int32)
        with self._rng_lock:
            self.rng, r = jax.random.split(self.rng)
        tokens, _ = self.gen(input_ids, valid, map_img, obs, r)
        toks = [int(t) for t in np.asarray(tokens)[0]]
        return self._decode_tokens(toks)


class DiscreteVLAServer(ActionServer):
    """Text-action serving for Discrete VLA (RT-2-style digit strings): the
    reference's generic _get_response generate loop (base_exp.py:670-714)
    with the parse -> sampled-retry contract of
    discrete_vla_inference_action.  ``continuous_batching`` > 0 serves the
    greedy decode through the slot engine (exp/decode_engine.py) so
    concurrent robot clients coalesce at decode-step granularity; parse
    failures fall back to the fused sampled-retry path."""

    def __init__(self, exp, cfg, params, tokenizer, norms=None,
                 host="0.0.0.0", port=7891, continuous_batching: int = 0,
                 prefill_chunk: int = 0):
        super().__init__(host, port)
        self.exp, self.cfg, self.tokenizer, self.norms = exp, cfg, tokenizer, norms
        self.params = params
        self.eos = getattr(tokenizer, "eos_token_id", 0) or 0
        self.rng = jax.random.PRNGKey(0)
        self._rng_lock = threading.Lock()
        self.engine = None
        if continuous_batching > 0:
            from dexbotic_tpu.exp.decode_engine import ContinuousBatchingEngine

            self.concurrent = True
            self.engine = ContinuousBatchingEngine(
                params["vlm"], cfg.vlm, slots=continuous_batching,
                max_new=cfg.max_new_tokens, eos_token_id=self.eos,
                prefill_chunk=prefill_chunk or None,
            )

    def _prepare(self, fields, files):
        prompt = fields.get("text", "")
        frames, order = _decode_frames([p for _, p in files])
        proc = self.exp.data.build_image_processor()
        imgs = preprocess_images_batch(frames, proc, channel_order=order)
        # AR text policy: assistant slot stays empty (discrete_vla_exp.py:116)
        ids = _cogact_prompt_ids(
            self.exp, self.cfg, self.tokenizer, prompt, assistant_stub=None
        )
        return np.asarray(ids, np.int32), imgs

    def get_response(self, fields, files):
        from dexbotic_tpu.models.discrete_vla import (
            discrete_vla_inference_action, parse_action_text,
        )

        ids, imgs = self._prepare(fields, files)
        if self.engine is not None:
            toks = self.engine.submit(ids, images=imgs)
            if self.eos in toks:
                toks = toks[: toks.index(self.eos)]
            text = self.tokenizer.decode(toks)
            action = parse_action_text(text, self.cfg.action_dim, self.cfg.vocab_bins)
            if action is None:  # rare: sampled retries through the fused path
                action = self._fused_decode(ids, imgs)
        else:
            action = self._fused_decode(ids, imgs)
            text = ""
        if self.norms is not None:
            lo = np.asarray(self.norms["min"], np.float64)
            hi = np.asarray(self.norms["max"], np.float64)
            action = lo + (np.clip(action[: len(lo)], -1, 1) + 1.0) * 0.5 * (hi - lo)
        return {"text": text, "actions": np.asarray(action).tolist()}

    def _fused_decode(self, ids, imgs):
        from dexbotic_tpu.models.discrete_vla import discrete_vla_inference_action

        with self._rng_lock:
            self.rng, r = jax.random.split(self.rng)
        input_ids = jnp.asarray(ids)[None]
        return discrete_vla_inference_action(
            self.params, self.cfg, self.tokenizer, input_ids,
            jnp.ones(input_ids.shape, jnp.int32), jnp.asarray(imgs)[None],
            self.eos, rng=r,
        )


class FlowVLAServer(ActionServer):
    """pi0/pi0.5/DM0 serving: multi-view form posts with states; batched
    requests supported via 'batch_size' (exp/pi0_exp.py:343-514 surface)."""

    def __init__(self, exp, cfg, params, tokenizer, norms, host="0.0.0.0", port=7891,
                 micro_batch: int = 0, micro_batch_window_ms: float = 5.0):
        super().__init__(host, port, micro_batch=micro_batch,
                         micro_batch_window_ms=micro_batch_window_ms)
        self.exp, self.cfg, self.tokenizer, self.norms = exp, cfg, tokenizer, norms
        # serving normalization matches the exp's training variant: pi0 is
        # mean/std, pi0.5/DM0 quantile (ref pi0_exp.py:366 vs pi05_exp.py:123)
        self.stats = ServingStats(
            norms, use_quantiles=getattr(exp.action, "use_quantiles", True)
        )
        self.infer = exp.make_infer_fn(cfg, params)
        self.rng = jax.random.PRNGKey(0)
        self.num_images = exp.data.num_images
        self._prompt_cache: dict = {}

    def _prompt_ids(self, prompt: str) -> np.ndarray:
        ids = self._prompt_cache.get(prompt)
        if ids is None:
            tok = self.exp.build_tokenization(self.tokenizer)
            out = tok(conversations=[{"from": "human", "value": prompt}])
            ids = np.asarray(out["input_ids"], np.int32)
            if len(self._prompt_cache) < 1024:
                self._prompt_cache[prompt] = ids
        return ids

    @staticmethod
    def _parse_state(row: str | None, dim: int) -> np.ndarray:
        """One state row -> zero-padded [dim] (the reference's PadState,
        action.py:5-30).  The reference contract is a JSON array
        (pi0_exp.py:467-479); bare comma-separated floats also accepted."""
        s = np.zeros((dim,), np.float32)
        if row:
            try:
                vals = np.asarray(json.loads(row), np.float32).reshape(-1)
            except (json.JSONDecodeError, ValueError):
                vals = np.asarray([float(x) for x in row.split(",")], np.float32)
            s[: len(vals)] = vals[:dim]
        return s

    def _infer_rows(self, prompts, payload_groups, state_rows, pad_to=None):
        """One batched device call over B rows (prompt + views + state each);
        ``pad_to`` pads by repeating row 0 (fixed compiled shape), padded
        rows sliced off."""
        B = len(prompts)
        Bp = max(pad_to or B, B)
        if Bp > B:
            prompts = list(prompts) + [prompts[0]] * (Bp - B)
            payload_groups = list(payload_groups) + [payload_groups[0]] * (Bp - B)
            state_rows = list(state_rows) + [state_rows[0]] * (Bp - B)
        per = len(payload_groups[0])
        assert all(len(g) == per for g in payload_groups), "ragged view groups"

        rows = [self._prompt_ids(p) for p in prompts]
        # Bucket token length to multiples of 64: padding to the exact batch
        # max would trigger a fresh XLA compile (minutes through the axon
        # tunnel, with queued requests blocked on the lock) for every new
        # max-L; bucketing bounds the compiled-shape count.
        L = -(-max(len(r) for r in rows) // 64) * 64
        ids_np = np.zeros((Bp, L), np.int32)
        for b, r in enumerate(rows):
            ids_np[b, : len(r)] = r
        ids = jnp.asarray(ids_np)
        text_mask = (ids != 0).astype(jnp.int32)

        proc = self.exp.data.build_image_processor()
        images_np = np.zeros((Bp, self.num_images, proc.size, proc.size, 3), np.float32)
        masks_np = np.zeros((Bp, self.num_images), np.int32)
        keep = min(per, self.num_images)
        frames, order = _decode_frames([p for g in payload_groups for p in g])
        flat = preprocess_images_batch(frames, proc, channel_order=order)
        for b in range(Bp):
            images_np[b, :keep] = flat[b * per : b * per + keep]
            masks_np[b, :keep] = 1

        # input transform: normalize the (padded) state with the same stats
        # the policy trained against (ref pi0_exp.py:364-370 ActionNorm)
        states_arr = jnp.asarray(self.stats.normalize("state", np.stack(state_rows)))
        self.rng, r = jax.random.split(self.rng)
        raw = np.asarray(
            jax.device_get(
                self.infer(ids, text_mask, jnp.asarray(images_np),
                           jnp.asarray(masks_np), states_arr, r)
            )
        )
        return [self._postprocess(raw[b], state_rows[b]) for b in range(B)]

    def get_response(self, fields, files):
        """Single or batched requests: with 'batch_size'=B, the posted images
        are B groups of views in order (exp/pi0_exp.py:400-425 semantics) and
        'states' carries B semicolon-separated vectors."""
        prompt = fields.get("text", "")
        B = int(fields.get("batch_size", 1))
        payloads = [p for _, p in files]
        assert len(payloads) % B == 0, (
            f"{len(payloads)} images not divisible by batch_size {B}"
        )
        per = len(payloads) // B
        groups = [payloads[i * per : (i + 1) * per] for i in range(B)]
        state_strs = (fields.get("states") or "").split(";")
        state_rows = [
            self._parse_state(state_strs[b] if b < len(state_strs) else None,
                              self.cfg.action_dim)
            for b in range(B)
        ]
        results = self._infer_rows([prompt] * B, groups, state_rows)
        return results[0] if B == 1 else results

    def get_batched_response(self, requests):
        """Coalesced single requests -> one padded device call per view-count
        group; each request keeps its own prompt and state."""
        results = [None] * len(requests)
        by_per: dict = {}
        for i, (fields, files) in enumerate(requests):
            payloads = [p for _, p in files]
            by_per.setdefault(len(payloads), []).append((i, fields, payloads))
        for per, items in by_per.items():
            prompts = [f.get("text", "") for _, f, _ in items]
            groups = [g for _, _, g in items]
            state_rows = [
                self._parse_state((f.get("states") or "").split(";")[0],
                                  self.cfg.action_dim)
                for _, f, _ in items
            ]
            pad_to = self.micro_batch if len(items) > 1 else None
            out = self._infer_rows(prompts, groups, state_rows, pad_to=pad_to)
            for k, (i, _, _) in enumerate(items):
                results[i] = out[k]
        return results

    def _postprocess(self, out, state_row):
        """Reference output transform (pi0_exp.py:370-376,500-514): denorm the
        action (ActionDenorm), delta->absolute against the RAW request state
        (AbsoluteAction with the exp's non_delta_mask), then slice the env
        action dims — slicing comes LAST, matching `action[..., :action_dim]`."""
        out = np.asarray(out, np.float64)
        if self.stats.has("action"):
            out = self.stats.denormalize("action", out)
        elif self.norms is not None and "min" in self.norms:
            # legacy flat {min,max} stats (CogACT-format norm files)
            lo = np.asarray(self.norms["min"], np.float64)
            hi = np.asarray(self.norms["max"], np.float64)
            d = min(out.shape[-1], len(lo))
            a = np.clip(out[:, :d], -1, 1)
            out = np.concatenate(
                [lo[:d] + (a + 1) * 0.5 * (hi[:d] - lo[:d]), out[:, d:]], axis=-1
            )
        icfg = getattr(self.exp, "inference_cfg", None)
        if icfg is not None:
            pipe, meta = icfg.build_output_transforms({})
            if pipe.transforms:
                data = {
                    "action": out,
                    "state": np.asarray(state_row, np.float64),
                    "meta_data": meta,
                }
                out = np.asarray(pipe(data)["action"])
            out = out[:, : getattr(icfg, "action_dim_out", out.shape[-1])]
        return out.tolist()


class NaVILAServer(ActionServer):
    """Navigation serving (reference exp/navila_exp.py:282-306 process_frame):
    one camera frame per request plus fields 'text', 'episode_first_frame'
    (resets the 8-frame history) and 'run_model' ('False' = only append the
    frame to the history, return []); responds with the parsed env action-int
    queue (0 stop / 1 forward / 2 left / 3 right, repeated per magnitude).
    Requests are serialized by the base lock — the history buffer is
    cross-request state."""

    def __init__(self, exp, cfg, params, tokenizer, host="0.0.0.0", port=7891,
                 max_new_tokens: int = 32, engine=None):
        super().__init__(host, port)
        from dexbotic_tpu.exp.navila_exp import NaVILAInferenceSession

        self.exp, self.cfg, self.tokenizer = exp, cfg, tokenizer
        self.session = NaVILAInferenceSession(
            exp, cfg, params, tokenizer, engine=engine,
            max_new_tokens=max_new_tokens)
        self.rng = jax.random.PRNGKey(0)

    @staticmethod
    def _parse_bool(value, default=False) -> bool:
        if value is None:
            return default
        return str(value).strip().lower() in ("1", "true", "t", "yes", "y", "on")

    def get_response(self, fields, files):
        from dexbotic_tpu.models.navila import parse_nav_action

        if self._parse_bool(fields.get("episode_first_frame")):
            self.session.reset()
        run_model = self._parse_bool(fields.get("run_model"), default=True)
        payloads = [p for _, p in files]
        frame = None
        if payloads:
            frames, order = _decode_frames(payloads[:1])
            # the reference navila server CHANNEL-FLIPS the decoded RGB frame
            # before process_images (navila_exp.py:314-317: Image.fromarray(
            # np.array(...)[..., ::-1])) — the policy consumes BGR; mirror it
            frame = frames[0] if order == "bgr" else frames[0][..., ::-1]
        if not run_model:
            if frame is not None:
                self.session.observe(frame)
            return []
        if frame is None:
            return []
        self.rng, r = jax.random.split(self.rng)
        text = self.session.act(frame, fields.get("text", ""), r)
        return parse_nav_action(text)
