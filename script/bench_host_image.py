"""Host image-preprocessing bench: native C++ kernel vs PIL/cv2 pipelines.

The serving hot path is decode -> pad-to-square -> resample -> normalize per
frame (reference: HF processor call inside process_frame).  Measures imgs/s
for the fused native kernel (csrc/fast_image.cpp) against the equivalent
PIL-based pipeline (reference semantics) and the cv2 two-step, at serving
(single frame, 480x640 -> 224) and collation (batch 64) shapes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from dexbotic_tpu.data.fast_image import available, pad_preprocess_batch_fast
from dexbotic_tpu.data.image_processing import (
    ImageProcessorConfig,
    expand2square,
    preprocess_image,
)


def timeit(fn, n_warm=3, n=20):
    for _ in range(n_warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def pil_pipeline(imgs, cfg, fill):
    out = np.empty((len(imgs), cfg.size, cfg.size, 3), np.float32)
    for i, im in enumerate(imgs):
        p = expand2square(im, fill)
        p = np.asarray(Image.fromarray(p).resize((cfg.size, cfg.size), Image.BICUBIC))
        out[i] = (p.astype(np.float32) / 255.0 - np.asarray(cfg.mean, np.float32)) / np.asarray(cfg.std, np.float32)
    return out


def cv2_pipeline(imgs, cfg, fill):
    import cv2

    out = np.empty((len(imgs), cfg.size, cfg.size, 3), np.float32)
    for i, im in enumerate(imgs):
        p = expand2square(im, fill)
        p = cv2.resize(p, (cfg.size, cfg.size), interpolation=cv2.INTER_CUBIC)
        out[i] = (p.astype(np.float32) / 255.0 - np.asarray(cfg.mean, np.float32)) / np.asarray(cfg.std, np.float32)
    return out


def main():
    assert available(), "no C++ toolchain"
    cfg = ImageProcessorConfig(size=224, resample="bicubic")
    fill = (127, 127, 127)
    rs = np.random.RandomState(0)
    for B, label in ((1, "serving B=1"), (8, "serving B=8"), (64, "collate B=64")):
        imgs = rs.randint(0, 255, (B, 480, 640, 3), np.uint8)
        t_native = timeit(lambda: pad_preprocess_batch_fast(
            imgs, cfg.size, mean=cfg.mean, std=cfg.std, fill=fill, interp="bicubic"))
        t_pil = timeit(lambda: pil_pipeline(imgs, cfg, fill))
        t_cv2 = timeit(lambda: cv2_pipeline(imgs, cfg, fill))
        print(
            f"{label}: native {B / t_native:8.1f} img/s | "
            f"PIL {B / t_pil:8.1f} img/s | cv2 {B / t_cv2:8.1f} img/s | "
            f"native vs PIL {t_pil / t_native:4.2f}x, vs cv2 {t_cv2 / t_native:4.2f}x"
        )


if __name__ == "__main__":
    main()
