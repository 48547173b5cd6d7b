"""Param-tree utilities."""

from __future__ import annotations

import jax
import numpy as np


def param_count(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def param_bytes(params) -> int:
    return int(sum(np.prod(x.shape) * x.dtype.itemsize for x in jax.tree.leaves(params)))


def summarize(params, max_depth: int = 2) -> dict:
    """Per-subtree parameter counts down to max_depth."""
    out = {}

    def walk(tree, path):
        if len(path) >= max_depth or not isinstance(tree, dict):
            out["/".join(path) or "<root>"] = param_count(tree)
            return
        for k, v in tree.items():
            walk(v, path + [str(k)])

    walk(params, [])
    return out


def cast_floating(params, dtype, min_ndim: int = 2):
    """Cast float leaves with ndim >= min_ndim (keeps norms/scalars fp32)."""
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= min_ndim:
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)
