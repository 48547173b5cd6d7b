"""Multi-host SPMD runtime glue.

Replaces the reference's torchrun/DeepSpeed launcher contract (SURVEY.md §2.8:
RANK / WORLD_SIZE / MASTER_ADDR env + NCCL process groups, e.g.
script/deepspeed launchers) with `jax.distributed`: one Python process per
host joins the cluster, after which `jax.devices()` is GLOBAL and every jitted
program runs SPMD with XLA-inserted collectives over ICI/DCN.  No per-rank
code paths are needed inside models — only at the edges (data feed,
checkpoint IO, logging), which is what this module provides.

Launch contract (either works):
  * TPU pods / GKE: call `maybe_initialize()` with no env set — jax
    auto-detects the slice topology.
  * Manual (and CPU multi-process testing): set
      DEXBOTIC_COORDINATOR=host:port
      DEXBOTIC_NUM_PROCESSES=N
      DEXBOTIC_PROCESS_ID=i
    (mirrors MASTER_ADDR / WORLD_SIZE / RANK).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the jax.distributed cluster if configured; idempotent.

    Returns True when running multi-process after the call.  Single-process
    runs (no env, no args, no pod metadata) are left untouched.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    # NB: jax.process_count() itself initialises the backend, after which
    # distributed.initialize() is rejected — probe the client object instead
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        _INITIALIZED = True
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("DEXBOTIC_COORDINATOR")
    n = num_processes or int(os.environ.get("DEXBOTIC_NUM_PROCESSES", "0")) or None
    pid = (
        process_id
        if process_id is not None
        else (int(os.environ["DEXBOTIC_PROCESS_ID"])
              if "DEXBOTIC_PROCESS_ID" in os.environ else None)
    )
    if coordinator is None and n is None:
        return False  # plain single-host run
    try:  # CPU multi-process (tests) needs gloo; ignored by the TPU backend
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 (older/newer jax without the flag)
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=n, process_id=pid
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """The rank-0 analogue: the only process that writes checkpoints/logs."""
    return jax.process_index() == 0


def local_batch_to_global(batch: dict, sharding) -> dict:
    """Per-process host batches -> one global jax.Array batch.

    Each process feeds its own rows (global_batch / process_count of them);
    the result is a single global array sharded over the 'data' mesh axis,
    the jax analogue of DistributedSampler + DDP per-rank loaders."""
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def allgather(tree, tiled: bool = True):
    """Gather host-local values from every process (RL rollout exchange:
    the reference's dist.all_gather over filtered GRPO samples).  With
    tiled=True results concatenate along axis 0 in process order."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=tiled)


def sync(name: str = "sync"):
    """Barrier across processes (e.g. after rank-0 checkpoint writes)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def host_copy(tree):
    """Full host copy of a (possibly cross-host-sharded) global pytree.

    Single-process: plain device_get.  Multi-process: re-layout to fully
    replicated first so every host holds all shards (the ZeRO-3
    gather-to-rank0-on-save analogue), then device_get locally."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return tree
    mesh_devices = np.asarray(jax.devices())
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # any leaf's sharding carries the mesh; fall back to a flat device mesh
    sh = getattr(leaves[0], "sharding", None)
    mesh = getattr(sh, "mesh", None) or Mesh(mesh_devices, ("all",))
    rep = NamedSharding(mesh, P())
    replicated = jax.jit(lambda t: t, out_shardings=jax.tree.map(lambda _: rep, tree))(
        tree
    )
    return jax.device_get(replicated)
