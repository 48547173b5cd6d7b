"""On-device image preprocessing (ops/image_ops.py): PIL-parity resize as
matmuls, so serving uploads raw uint8 frames and the whole
frame->resize->normalize->encode path is one jitted program."""

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.data.image_processing import (
    ImageProcessorConfig, expand2square, preprocess_image,
)
from dexbotic_tpu.ops.image_ops import make_device_preprocess, resize_matrix


def test_resize_matrix_rows_sum_to_one():
    for resample in ("bilinear", "bicubic"):
        for out_n, in_n in ((224, 480), (224, 224), (336, 112)):
            m = resize_matrix(out_n, in_n, resample)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)


def test_device_preprocess_matches_pil_path():
    rs = np.random.RandomState(0)
    for resample in ("bilinear", "bicubic"):
        cfg = ImageProcessorConfig(
            size=224, resample=resample,
            mean=(0.48, 0.46, 0.41), std=(0.27, 0.26, 0.28),
        )
        frames = rs.randint(0, 256, (2, 224, 320, 3)).astype(np.uint8)
        ref = np.stack([preprocess_image(f, cfg) for f in frames])
        fn = jax.jit(make_device_preprocess(
            (224, 320), 224, resample=resample, mean=cfg.mean, std=cfg.std,
        ))
        out = np.asarray(fn(jnp.asarray(frames)))
        # <=2 uint8 quanta of slack in pixel space, like the native host
        # kernel (PIL rounds its uint8 intermediate between the two passes)
        err = np.abs(out - ref) * np.asarray(cfg.std)[None, None, None, :] * 255.0
        assert err.max() <= 2.0 + 1e-3, (resample, err.max())


def test_device_preprocess_pad_to_square_matches_expand2square():
    rs = np.random.RandomState(1)
    cfg = ImageProcessorConfig(size=112, resample="bicubic",
                               mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    fill = (124, 116, 103)
    frames = rs.randint(0, 256, (3, 96, 160, 3)).astype(np.uint8)
    ref = np.stack([
        preprocess_image(expand2square(f, fill), cfg) for f in frames
    ])
    fn = jax.jit(make_device_preprocess(
        (96, 160), 112, resample="bicubic", mean=cfg.mean, std=cfg.std,
        pad_to_square=True, fill=fill,
    ))
    out = np.asarray(fn(jnp.asarray(frames)))
    err = np.abs(out - ref) * np.asarray(cfg.std)[None, None, None, :] * 255.0
    assert err.max() <= 2.0 + 1e-3, err.max()
