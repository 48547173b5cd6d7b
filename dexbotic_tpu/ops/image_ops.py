"""On-device image preprocessing: PIL-parity antialiased resize as matmuls.

SURVEY §2.9's north star is camera-frame -> action-chunk as ONE device
program.  The host C++ kernel (csrc/fast_image.cpp) already covers the
host path; this module moves resize + normalize INTO the jitted serving
program so the host uploads raw decoded uint8 frames and does nothing else.

PIL's resampler is a separable convolution whose support scales with the
downscale factor (antialiasing) and whose border windows are clipped and
renormalized (PIL precompute_coeffs; mirrored by fast_image.cpp:make_taps).
Separability means each axis is a fixed [out, in] weight matrix, so the
whole resample is two matmuls per image — exactly MXU-shaped:

    out[b, oy, ox, c] = Ty[oy, y] * img[b, y, x, c] * Tx[ox, x]

Weights are precomputed host-side in float64 at trace time (static shapes).
Parity with the PIL/HF-processor path is pinned to <=2 uint8 quanta by
tests (same tolerance as the native host kernel).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _bicubic_w(x: np.ndarray) -> np.ndarray:
    # PIL's bicubic filter, a = -0.5
    a = -0.5
    x = np.abs(x)
    return np.where(
        x < 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


def _bilinear_w(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


def resize_matrix(out_n: int, in_n: int, resample: str = "bicubic") -> np.ndarray:
    """Dense [out_n, in_n] PIL-parity resampling matrix for one axis."""
    support0 = 2.0 if resample == "bicubic" else 1.0
    kernel = _bicubic_w if resample == "bicubic" else _bilinear_w
    scale = in_n / out_n
    filterscale = max(scale, 1.0)
    support = support0 * filterscale

    w = np.zeros((out_n, in_n), np.float64)
    for x in range(out_n):
        center = (x + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_n)
        ks = np.arange(xmin, xmax)
        vals = kernel((ks + 0.5 - center) / filterscale)
        total = vals.sum()
        if total != 0.0:
            vals = vals / total
        w[x, xmin:xmax] = vals
    return w


def make_device_preprocess(
    in_hw: tuple[int, int],
    size: int,
    resample: str = "bicubic",
    mean=(0.0, 0.0, 0.0),
    std=(1.0, 1.0, 1.0),
    rescale: float = 1.0 / 255.0,
    pad_to_square: bool = False,
    fill=(0, 0, 0),
):
    """Returns a jittable fn: uint8 [B, H, W, 3] -> float32 [B, size, size, 3].

    ``pad_to_square`` reproduces expand2square: the frame is centered on a
    max(H, W)^2 canvas filled with ``fill`` before the resize (the serving
    image path for CLIP-style processors)."""
    H, W = in_hw
    if pad_to_square and H != W:
        side = max(H, W)
        src_h = src_w = side
        top, left = (side - H) // 2, (side - W) // 2
    else:
        src_h, src_w = H, W
        top = left = 0

    ty = jnp.asarray(resize_matrix(size, src_h, resample), jnp.float32)
    tx = jnp.asarray(resize_matrix(size, src_w, resample), jnp.float32)
    mean_a = jnp.asarray(mean, jnp.float32)
    inv_std = jnp.asarray(1.0 / np.asarray(std, np.float64), jnp.float32)
    fill_a = jnp.asarray(fill, jnp.float32)

    def fn(frames: jnp.ndarray) -> jnp.ndarray:
        x = frames.astype(jnp.float32)
        if pad_to_square and (top or left):
            import jax

            B = x.shape[0]
            canvas = jnp.broadcast_to(
                fill_a[None, None, None, :], (B, src_h, src_w, 3)
            ).astype(jnp.float32)
            x = jax.lax.dynamic_update_slice(canvas, x, (0, top, left, 0))
        # separable resample in PIL's order — horizontal first, with the
        # intermediate ROUNDED AND CLIPPED to uint8 range (Resample.c clip8;
        # bicubic overshoot otherwise composes differently, up to ~17/255)
        x = jnp.einsum("jx,byxc->byjc", tx, x)  # horizontal: [B, H, size, 3]
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
        x = jnp.einsum("iy,byxc->bixc", ty, x)  # vertical: [B, size, size, 3]
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
        return (x * rescale - mean_a) * inv_std

    return fn
