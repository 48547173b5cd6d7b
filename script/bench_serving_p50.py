"""Frame-to-action p50 latency, component-wise (BASELINE.json north-star).

In this environment the chip sits behind the axon tunnel, so a wall-clock
HTTP p50 would measure the tunnel's per-dispatch RPC (seconds), not the
framework.  Instead: the HOST serving pipeline (multipart parse -> PNG
decode -> fused pad+preprocess -> tokenize -> denorm -> JSON) is measured
for real through CogActServer.get_response with the device call stubbed,
and the DEVICE program time comes from bench.py's on-chip scan measurement.
Co-located p50 = host p50 + device ms/chunk.

Run: python script/bench_serving_p50.py  (host part runs anywhere; pass
--device-ms from the latest bench.py run, default 12.3 = honest 1b B=1
round-3 harness; the old 4.09 came from the hoisted-prefill timing bug).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device-ms", type=float, default=12.3,
                    help="on-chip frame->chunk ms (bench.py; 1b B=1 default)")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    # force CPU so building the tiny exp never touches the tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dexbotic_tpu.exp import base_exp
    from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
    from dexbotic_tpu.exp.serve import CogActServer

    exp = CogActExp(
        model=CogActModelConfig(llm_preset="test", vit_preset="test",
                                action_model_type="DiT-S", action_dim=7,
                                chunk_size=16),
        data=base_exp.DataConfig(image_processor="224"),
        tokenizer=base_exp.TokenizerConfig(model_max_length=512),
    )
    cfg = exp.model.build_config()
    tokenizer = exp.tokenizer.build_tokenizer()
    norms = {"min": (-np.ones(7)).tolist(), "max": np.ones(7).tolist()}

    server = CogActServer.__new__(CogActServer)
    CogActServer.__bases__[0].__init__(server)  # ActionServer state
    server.exp, server.cfg, server.tokenizer, server.norms = exp, cfg, tokenizer, norms
    chunk = np.zeros((1, cfg.chunk_size, cfg.action_dim), np.float32)
    server.infer = lambda ids, valid, imgs, r: chunk  # device call stubbed
    import jax as _jax

    server.rng = _jax.random.PRNGKey(0)

    frame = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8))
    buf = io.BytesIO()
    frame.save(buf, format="PNG")
    payload = buf.getvalue()
    fields = {"text": "put the moka pot on the stove"}
    files = [("image", payload)]

    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        server.get_response(fields, files)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat[10:])  # drop warmup
    host_p50, host_p90 = np.percentile(lat, 50), np.percentile(lat, 90)
    print(f"host pipeline (parse+decode+preprocess+tokenize+denorm+json):")
    print(f"  p50 {host_p50:6.2f} ms   p90 {host_p90:6.2f} ms   "
          f"(480x640 PNG -> 224, 1 view)")
    print(f"device program (from bench.py): {args.device_ms:.2f} ms/chunk")
    print(f"projected co-located frame->action p50: "
          f"{host_p50 + args.device_ms:6.2f} ms")


if __name__ == "__main__":
    main()
