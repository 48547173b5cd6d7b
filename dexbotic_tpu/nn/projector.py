"""Multimodal projector zoo.

Mirrors the reference factory's surface (/root/reference/dexbotic/model/
modules/mm_projector/builder.py:36-81): 'linear', 'linear{N}x',
'mlp{N}x_gelu', 'mlp_downsample' (2x2 space-to-depth + LN + MLP).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from dexbotic_tpu.nn import core
from dexbotic_tpu.ops.norms import layer_norm


def init_projector(key, projector_type: str, mm_hidden: int, hidden: int, dtype=jnp.float32):
    if projector_type == "linear":
        return {"fc": core.linear_init(key, mm_hidden, hidden, True, dtype)}

    m = re.match(r"^linear(\d+)x$", projector_type)
    if m:
        mult = int(m.group(1))
        return {"fc": core.linear_init(key, mm_hidden * mult, hidden, False, dtype)}

    if projector_type == "mlp_downsample":
        ks = jax.random.split(key, 2)
        return {
            "ln": {
                "w": jnp.ones((mm_hidden * 4,), jnp.float32),
                "b": jnp.zeros((mm_hidden * 4,), jnp.float32),
            },
            "fc0": core.linear_init(ks[0], mm_hidden * 4, hidden, True, dtype),
            "fc1": core.linear_init(ks[1], hidden, hidden, True, dtype),
        }

    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        depth = int(m.group(1))
        ks = jax.random.split(key, depth)
        p = {"fc0": core.linear_init(ks[0], mm_hidden, hidden, True, dtype)}
        for i in range(1, depth):
            p[f"fc{i}"] = core.linear_init(ks[i], hidden, hidden, True, dtype)
        return p

    raise ValueError(f"Unknown projector type: {projector_type}")


def _downsample_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Space-to-depth 2x2 over a square token grid; odd grids zero-padded
    (matches DownSampleBlock, mm_projector/builder.py:9-33 incl. its
    transpose quirk: output channel order is [row-pair, col-pair])."""
    B, N, C = x.shape
    g = int(round(N**0.5))
    assert g * g == N, f"non-square token grid: {N}"
    x = x.reshape(B, g, g, C)
    if g % 2 == 1:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        g += 1
    # group pairs along W then H, matching the reference's two-step view/permute
    x = x.reshape(B, g, g // 2, C * 2)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, g // 2, g // 2, C * 4)
    return x.reshape(B, (g // 2) ** 2, C * 4)


def apply_projector(params, x: jnp.ndarray, projector_type: str) -> jnp.ndarray:
    t = projector_type
    if t == "linear" or re.match(r"^linear(\d+)x$", t):
        return core.linear(params["fc"], x)
    if t == "mlp_downsample":
        x = _downsample_2x2(x)
        x = layer_norm(x, params["ln"]["w"], params["ln"]["b"], eps=1e-5)
        x = core.linear(params["fc0"], x)
        x = jax.nn.gelu(x, approximate=False)
        return core.linear(params["fc1"], x)
    m = re.match(r"^mlp(\d+)x_gelu$", t)
    if m:
        depth = int(m.group(1))
        out = core.linear(params["fc0"], x)
        for i in range(1, depth):
            out = core.linear(params[f"fc{i}"], jax.nn.gelu(out, approximate=False))
        return out
    raise ValueError(f"Unknown projector type: {t}")
