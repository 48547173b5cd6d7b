"""Host-side image preprocessing (numpy/cv2; no torchvision/albumentations).

Equivalent surface to the reference's PreprocessRGB + HF image processors
(/root/reference/dexbotic/data/dataset/rgb_preprocess.py) and its PixelAug
augmentation policies (augmentations.py): pad-to-square, resize, rescale,
normalize, and pixel-level augmentation, producing NHWC float32 arrays for
the NHWC-native ViT.
"""

from __future__ import annotations

import dataclasses

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# Standard normalization constants.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ImageProcessorConfig:
    size: int = 224
    mean: tuple = SIGLIP_MEAN
    std: tuple = SIGLIP_STD
    resample: str = "bicubic"
    rescale: float = 1.0 / 255.0

    @classmethod
    def clip_336(cls):
        return cls(size=336, mean=CLIP_MEAN, std=CLIP_STD)

    @classmethod
    def siglip(cls, size=384):
        return cls(size=size, mean=SIGLIP_MEAN, std=SIGLIP_STD)


_CV2_INTERP = {"bicubic": 3, "bilinear": 1, "nearest": 0}  # cv2.INTER_*


def to_numpy_image(image) -> np.ndarray:
    """PIL.Image | ndarray -> uint8 HWC RGB ndarray."""
    if isinstance(image, np.ndarray):
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        return image
    return np.asarray(image.convert("RGB"))


def expand2square(image: np.ndarray, fill: tuple[int, int, int]) -> np.ndarray:
    """Pad to square, centered (dexbotic_arch.py:516-529 semantics)."""
    h, w = image.shape[:2]
    if h == w:
        return image
    side = max(h, w)
    out = np.empty((side, side, 3), dtype=image.dtype)
    out[:, :] = np.asarray(fill, dtype=image.dtype)
    top = (side - h) // 2
    left = (side - w) // 2
    out[top : top + h, left : left + w] = image
    return out


def resize(image: np.ndarray, size: int, resample: str = "bicubic") -> np.ndarray:
    if image.shape[0] == size and image.shape[1] == size:
        return image
    if cv2 is not None:
        return cv2.resize(image, (size, size), interpolation=_CV2_INTERP[resample])
    # numpy fallback: nearest
    ys = (np.arange(size) * image.shape[0] / size).astype(int)
    xs = (np.arange(size) * image.shape[1] / size).astype(int)
    return image[ys][:, xs]


def preprocess_image(image, cfg: ImageProcessorConfig) -> np.ndarray:
    """uint8 HWC -> normalized float32 HWC at cfg.size."""
    arr = to_numpy_image(image)
    arr = resize(arr, cfg.size, cfg.resample)
    arr = arr.astype(np.float32) * cfg.rescale
    return (arr - np.asarray(cfg.mean, np.float32)) / np.asarray(cfg.std, np.float32)


def preprocess_images_batch(images, cfg: ImageProcessorConfig, use_native: bool = True) -> np.ndarray:
    """Batch of identically-sized uint8 frames -> [B, size, size, 3] float32.

    Uses the fused C++ kernel (csrc/fast_image.cpp) when available and the
    frames share a shape; falls back to the per-image path."""
    arrs = [to_numpy_image(im) for im in images]
    if use_native and len({a.shape for a in arrs}) == 1 and arrs[0].dtype == np.uint8:
        try:
            from dexbotic_tpu.data.fast_image import preprocess_batch_fast

            return preprocess_batch_fast(
                np.stack(arrs), cfg.size, mean=cfg.mean, std=cfg.std
            )
        except Exception:  # noqa: BLE001 (no toolchain)
            pass
    return np.stack([preprocess_image(a, cfg) for a in arrs])


# ---------------------------------------------------------------------------
# Augmentation policies (host-side numpy; reference augmentations.py surface)
# ---------------------------------------------------------------------------


def _adjust_brightness_contrast(img, rng, brightness=0.2, contrast=0.2, p=0.5):
    if rng.random() < p:
        alpha = 1.0 + rng.uniform(-contrast, contrast)
        beta = rng.uniform(-brightness, brightness) * 255.0
        img = np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)
    return img


def _adjust_hue_sat(img, rng, hue=10, sat=0.2, p=0.3):
    if cv2 is None or rng.random() >= p:
        return img
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue, hue)) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] * (1 + rng.uniform(-sat, sat)), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def _random_resized_crop(img, rng, scale=(0.9, 1.0), p=0.5):
    if rng.random() >= p:
        return img
    h, w = img.shape[:2]
    s = rng.uniform(*scale)
    ch, cw = int(h * s), int(w * s)
    top = rng.integers(0, h - ch + 1)
    left = rng.integers(0, w - cw + 1)
    crop = img[top : top + ch, left : left + cw]
    return resize(crop, h, "bilinear") if h == w else crop


class PixelAug:
    """Named augmentation policies; 'identity'/None is a no-op.

    Policies mirror the intent of the reference set
    (v1/v2/v3/pi0/dm0/color/color_dm0/identity, augmentations.py:24-233):
    color policies jitter brightness/contrast/hue/sat; pi0/dm0 add a mild
    random resized crop.
    """

    POLICIES = ("v1", "v2", "v3", "pi0", "dm0", "color", "color_dm0", "identity")

    def __init__(self, policy: str = "identity", seed: int | None = None):
        if policy not in self.POLICIES:
            raise ValueError(f"unknown aug policy {policy}")
        self.policy = policy
        self.rng = np.random.default_rng(seed)

    def __call__(self, image) -> np.ndarray:
        img = to_numpy_image(image)
        if self.policy == "identity":
            return img
        rng = self.rng
        if self.policy in ("color", "color_dm0"):
            img = _adjust_brightness_contrast(img, rng)
            img = _adjust_hue_sat(img, rng)
        elif self.policy in ("v1", "v2", "v3"):
            img = _adjust_brightness_contrast(img, rng, p=0.5)
            if self.policy in ("v2", "v3"):
                img = _adjust_hue_sat(img, rng)
        elif self.policy in ("pi0", "dm0"):
            img = _random_resized_crop(img, rng)
            img = _adjust_brightness_contrast(img, rng, brightness=0.1, contrast=0.1)
        return img


class PreprocessRGB:
    """None-tolerant per-view preprocessing: pad-to-square -> aug -> processor."""

    def __init__(
        self,
        processor: ImageProcessorConfig,
        image_aspect_ratio: str | None = "pad",
        augmentations: PixelAug | None = None,
        image_pad_mode: str = "mean",
    ):
        self.processor = processor
        self.image_aspect_ratio = image_aspect_ratio
        self.augmentations = augmentations
        self.image_pad_mode = image_pad_mode

    def __call__(self, image) -> np.ndarray:
        if image is None:
            return np.zeros((self.processor.size, self.processor.size, 3), np.float32)
        img = to_numpy_image(image)
        if self.image_aspect_ratio == "pad":
            if self.image_pad_mode == "zero":
                fill = (0, 0, 0)
            else:
                fill = tuple(int(x * 255) for x in self.processor.mean)
            img = expand2square(img, fill)
        if self.augmentations is not None:
            img = self.augmentations(img)
        return preprocess_image(img, self.processor)


class DummyRGBProcessor:
    def __call__(self, image) -> np.ndarray:
        return np.zeros((1,), np.float32)


class PreprocessDepth:
    """Aspect-keeping resize + pad for uint16 depth maps
    (reference: data/dataset/depth_preprocess.py).  Returns float32 [H, W, 1]
    in meters (mm / 1000)."""

    def __init__(self, target_size: int = 224, pad_value: float = 0.0, scale: float = 1e-3):
        self.target_size = target_size
        self.pad_value = pad_value
        self.scale = scale

    def __call__(self, depth) -> np.ndarray:
        s = self.target_size
        if depth is None:
            return np.zeros((s, s, 1), np.float32)
        d = np.asarray(depth, np.float32) * self.scale
        if d.ndim == 3:
            d = d[..., 0]
        h, w = d.shape
        r = s / max(h, w)
        nh, nw = max(1, int(round(h * r))), max(1, int(round(w * r)))
        if cv2 is not None:
            d = cv2.resize(d, (nw, nh), interpolation=1)
        else:
            ys = (np.arange(nh) * h / nh).astype(int)
            xs = (np.arange(nw) * w / nw).astype(int)
            d = d[ys][:, xs]
        out = np.full((s, s), self.pad_value, np.float32)
        top, left = (s - nh) // 2, (s - nw) // 2
        out[top : top + nh, left : left + nw] = d
        return out[..., None]
