"""Device mesh + GSPMD sharding rules.

Replaces the reference's DeepSpeed-ZeRO/DDP substrate (SURVEY.md §2.8) with
XLA GSPMD: a ('data', 'model') mesh over ICI, fully-sharded parameters along
'data' (the ZeRO-3 analogue — parameters are sharded at rest and all-gathered
by XLA where used), batch sharded along 'data', optional tensor-parallel
'model' axis for large LLMs.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None, model: int = 1, expert: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * expert)
    need = data * model * expert
    assert need <= n, f"mesh {data}x{expert}x{model} needs {need} devices, have {n}"
    if expert > 1:
        arr = np.asarray(devices[:need]).reshape(data, expert, model)
        return Mesh(arr, ("data", "expert", "model"))
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data parallelism for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_specs(params, mesh: Mesh, min_size: int = 2**14):
    """Fully-sharded (ZeRO-3-style) PartitionSpecs for a param pytree.

    Each leaf is sharded along its largest axis divisible by the 'data' mesh
    size; small or indivisible leaves are replicated.  XLA inserts the
    all-gathers/reduce-scatters (the GSPMD analogue of ZeRO-3's gather-on-use,
    script/deepspeed/zero3.json in the reference).
    """
    n = mesh.shape["data"]

    def spec_for(x):
        if x.ndim == 0 or x.size < min_size or n == 1:
            return P()
        # prefer sharding the largest divisible axis
        order = sorted(range(x.ndim), key=lambda a: -x.shape[a])
        for axis in order:
            if x.shape[axis] % n == 0:
                spec = [None] * x.ndim
                spec[axis] = "data"
                return P(*spec)
        return P()

    return jax.tree.map(spec_for, params)


def fsdp_shardings(params, mesh: Mesh, min_size: int = 2**14):
    specs = fsdp_param_specs(params, mesh, min_size)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh, min_size: int = 2**14):
    """Place a param pytree according to fsdp rules."""
    shardings = fsdp_shardings(params, mesh, min_size)
    return jax.tree.map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# Tensor parallelism (2-D mesh): megatron-style column/row sharding
# ---------------------------------------------------------------------------

# path-substring -> (axis sharded over 'model') for transformer layer params;
# [in, out] kernels: attn q/k/v and mlp gate/up are column-parallel (out dim),
# attn.o and mlp.down are row-parallel (in dim).
TP_RULES = (
    (("attn", "q", "w"), 1),
    (("attn", "k", "w"), 1),
    (("attn", "v", "w"), 1),
    (("attn", "q", "b"), 0),
    (("attn", "k", "b"), 0),
    (("attn", "v", "b"), 0),
    (("attn", "o", "w"), 0),
    (("mlp", "gate", "w"), 1),
    (("mlp", "up", "w"), 1),
    (("mlp", "down", "w"), 0),
    (("embed", "embedding"), 1),
    (("lm_head", "w"), 1),
)


def _path_keys(path) -> tuple:
    return tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)


def tp_fsdp_param_specs(params, mesh: Mesh, min_size: int = 2**14):
    """Combined tensor-parallel ('model' axis) + fully-sharded ('data' axis)
    PartitionSpecs.  TP rules shard matmul dims megatron-style; the data axis
    then shards the LARGEST remaining divisible axis (ZeRO-3 analogue).
    With mesh model=1 this degrades to pure fsdp."""
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    n_expert = dict(mesh.shape).get("expert", 1)

    # MoE modules are identified by the presence of a sibling 'router' key
    # (nn/moe.py:moe_init) rather than by ndim, so both layer-stacked
    # [L, E, in, out] and per-layer [E, in, out] expert kernels shard their
    # expert axis — a dense layer-stacked [L, in, out] kernel shares the
    # same trailing ("mlp", <name>, "w") path but has no router sibling.
    moe_parents = set()
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        keys = _path_keys(path)
        if len(keys) >= 2 and keys[-2] == "router":
            moe_parents.add(keys[:-2])

    def spec_for(path, x):
        keys = _path_keys(path)
        spec = [None] * x.ndim
        # expert parallelism: shard the expert axis (ndim-3: the axis just
        # before [in, out]) of gate/up/down kernels; router stays replicated.
        if (
            n_expert > 1
            and x.ndim >= 3
            and len(keys) >= 2
            and keys[-2] in ("gate", "up", "down")
            and keys[-1] == "w"
            and keys[:-2] in moe_parents
            and x.shape[x.ndim - 3] % n_expert == 0
        ):
            spec[x.ndim - 3] = "expert"
        if n_model > 1 and x.ndim >= 1:
            for rule_keys, axis in TP_RULES:
                if len(keys) >= len(rule_keys) and tuple(keys[-len(rule_keys):]) == rule_keys:
                    # rules are for 2D kernels/1D biases; stacked-layer leaves
                    # carry a leading num_layers axis -> shift right
                    ax = axis + (x.ndim - (2 if rule_keys[-1] == "w" or rule_keys[-1] == "embedding" else 1))
                    if 0 <= ax < x.ndim and x.shape[ax] % n_model == 0:
                        spec[ax] = "model"
                    break
        if n_data > 1 and x.size >= min_size:
            order = sorted(range(x.ndim), key=lambda a: -x.shape[a])
            for axis in order:
                if spec[axis] is None and x.shape[axis] % n_data == 0:
                    spec[axis] = "data"
                    break
        return P(*spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_fsdp_shardings(params, mesh: Mesh, min_size: int = 2**14):
    specs = tp_fsdp_param_specs(params, mesh, min_size)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
