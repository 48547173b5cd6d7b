"""Host data-loader throughput: thread vs forked-process decode workers
(VERDICT r4 #9; reference trains with 64-worker torch DataLoaders,
exp/base_exp.py:453-503).

Synthetic dataset shaped like real fine-tune items: one JPEG-encoded
224x224 frame (cv2 imdecode) + PreprocessRGB (resize/pad/normalize) + the
tokenize/transform Python dispatch cost.  Prints img/s for each
(mode, workers) cell and the host-budget margin math for an 8-chip fsdp
step — on THIS 1-core VM process workers mostly measure overhead; the knob
exists for real multi-core hosts.

Run: python script/bench_loader.py  (host-only; no TPU use)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2
    import numpy as np

    from dexbotic_tpu.data.image_processing import (
        ImageProcessorConfig, preprocess_image,
    )
    from dexbotic_tpu.data.loader import DataLoader

    rs = np.random.RandomState(0)
    frame = (rs.rand(224, 224, 3) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", frame)
    assert ok
    jpeg = enc.tobytes()
    proc = ImageProcessorConfig(size=224)

    class SyntheticDS:
        """JPEG decode + preprocess + a token-assembly-shaped Python loop."""

        def __len__(self):
            return 4096

        def __getitem__(self, i):
            img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
            x = preprocess_image(img, proc)
            ids = [1] + [32000 + (i + k) % 256 for k in range(256)] + [2]
            return {"image": x.astype(np.float32), "input_ids": np.asarray(ids)}

    def collate(items):
        return {
            "image": np.stack([it["image"] for it in items]),
            "input_ids": np.stack([it["input_ids"] for it in items]),
        }

    B = 32
    n_batches = int(os.environ.get("BENCH_LOADER_BATCHES", "16"))
    rows = []
    for mode, workers in (("thread", 1), ("thread", 4), ("thread", 8),
                          ("process", 2), ("process", 4), ("process", 8)):
        dl = DataLoader(SyntheticDS(), collate, batch_size=B, num_workers=workers,
                        epochs=1, seed=0, worker_mode=mode)
        it = iter(dl)
        next(it)  # warm the pool (fork/thread spinup excluded)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        img_s = B * n_batches / dt
        rows.append({"mode": mode, "workers": workers,
                     "img_per_s": round(img_s, 1)})
        print(json.dumps(rows[-1]), flush=True)
        # drain/close worker pools promptly
        del it, dl

    best = max(rows, key=lambda r: r["img_per_s"])
    # margin math: an 8-chip fsdp CogACT-0.5b step at the measured 62.7
    # samples/s/chip consumes 501 img/s of host decode
    need = 8 * 62.7
    print(json.dumps({
        "metric": "loader_best_img_per_s",
        "value": best["img_per_s"],
        "unit": "img/s",
        "best_mode": f"{best['mode']}x{best['workers']}",
        "host_budget_8chip_fsdp_img_per_s": round(need, 1),
        "margin": round(best["img_per_s"] / need, 3),
        "note": "1-core VM; process workers need real cores to scale",
    }))


if __name__ == "__main__":
    main()
