"""Minimal functional NN primitives.

Modules are (init -> param-pytree, apply(params, x)) pairs of plain
functions; no module framework.  Weights are stored [in, out] (JAX
convention); HF checkpoint converters transpose.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

Initializer = Callable[[jax.Array, tuple, jnp.dtype], jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def normal_init(stddev: float = 0.02) -> Initializer:
    def init(key, shape, dtype):
        return (jax.random.normal(key, shape, jnp.float32) * stddev).astype(dtype)

    return init


def zeros_init() -> Initializer:
    def init(key, shape, dtype):
        return jnp.zeros(shape, dtype)

    return init


def ones_init() -> Initializer:
    def init(key, shape, dtype):
        return jnp.ones(shape, dtype)

    return init


def constant_init(value: float) -> Initializer:
    def init(key, shape, dtype):
        return jnp.full(shape, value, dtype)

    return init


def xavier_uniform_init() -> Initializer:
    def init(key, shape, dtype):
        fan_in, fan_out = shape[0], shape[-1]
        limit = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, jnp.float32, -limit, limit).astype(dtype)

    return init


def torch_linear_init() -> Initializer:
    """Torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype):
        limit = 1.0 / math.sqrt(shape[0])
        return jax.random.uniform(key, shape, jnp.float32, -limit, limit).astype(dtype)

    return init


# ---------------------------------------------------------------------------
# Linear / Embedding / MLP
# ---------------------------------------------------------------------------


def linear_init(
    key,
    in_dim: int,
    out_dim: int,
    use_bias: bool = True,
    dtype=jnp.float32,
    w_init: Initializer | None = None,
    b_init: Initializer | None = None,
):
    w_init = w_init or torch_linear_init()
    kw, kb = jax.random.split(key)
    p = {"w": w_init(kw, (in_dim, out_dim), dtype)}
    if use_bias:
        b_init_fn = b_init or torch_linear_init()
        p["b"] = b_init_fn(kb, (out_dim,), dtype)
    return p


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    w = p["w"]
    if isinstance(w, dict):  # weight-only int8 {"q", "s"} (ops/quant.py)
        # Pallas kernel streams int8 from HBM and dequantizes in-register
        # (XLA would materialize bf16 weight copies); falls back to the XLA
        # formulation off-TPU / for non-dividing shapes.
        from dexbotic_tpu.ops.quant_matmul import quant_linear

        return quant_linear(p, x)
    out = x @ w.astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32, init: Initializer | None = None):
    init = init or normal_init(0.02)
    return {"embedding": init(key, (vocab, dim), dtype)}


def embed(p, ids: jnp.ndarray) -> jnp.ndarray:
    e = p["embedding"]
    if isinstance(e, dict):  # weight-only int8, per-row scales (ops/quant.py)
        q = jnp.take(e["q"], ids, axis=0)
        s = jnp.take(e["s"], ids, axis=0)
        return q.astype(s.dtype) * s
    return jnp.take(e, ids, axis=0)


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,  # exact
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


def gated_mlp_init(key, hidden: int, intermediate: int, dtype=jnp.float32, use_bias=False):
    ks = jax.random.split(key, 3)
    return {
        "gate": linear_init(ks[0], hidden, intermediate, use_bias, dtype),
        "up": linear_init(ks[1], hidden, intermediate, use_bias, dtype),
        "down": linear_init(ks[2], intermediate, hidden, use_bias, dtype),
    }


def gated_mlp(p, x: jnp.ndarray, act: str = "silu") -> jnp.ndarray:
    return linear(p["down"], ACTIVATIONS[act](linear(p["gate"], x)) * linear(p["up"], x))


def mlp_init(key, dims: list[int], dtype=jnp.float32, use_bias=True, w_init=None):
    """Plain MLP: dims = [in, h1, ..., out]."""
    ks = jax.random.split(key, len(dims) - 1)
    return {
        f"fc{i}": linear_init(ks[i], dims[i], dims[i + 1], use_bias, dtype, w_init=w_init)
        for i in range(len(dims) - 1)
    }


def mlp(p, x: jnp.ndarray, act: str = "gelu") -> jnp.ndarray:
    n = len(p)
    for i in range(n):
        x = linear(p[f"fc{i}"], x)
        if i < n - 1:
            x = ACTIVATIONS[act](x)
    return x
