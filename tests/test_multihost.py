"""Two-process jax.distributed (gloo/CPU) coverage of the multi-host paths:
global-batch assembly, primary-only checkpoint writes, optimizer-state
restore across processes (the torchrun/DeepSpeed multi-node analogue,
SURVEY.md §2.8)."""

import pytest
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, os.environ["MH_REPO"])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                           "--xla_cpu_max_isa=AVX512")  # host-portable cache (conftest note)
    import jax
    jax.config.update("jax_platforms", "cpu")
    # per-process-id persistent cache: repeat suite runs skip the worker
    # compiles; disjoint dirs (mh0/mh1) so the pair never writes concurrently
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.environ["MH_REPO"], "tests", ".jax_test_cache",
        "mh" + os.environ["DEXBOTIC_PROCESS_ID"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    from dexbotic_tpu.parallel import multihost
    assert multihost.maybe_initialize()
    import jax.numpy as jnp
    import numpy as np
    from dexbotic_tpu.exp.optim import OptimizerConfig
    from dexbotic_tpu.exp.trainer import Trainer, TrainerConfig

    pid = jax.process_index()
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {}

    params = {"w": jnp.ones((8, 4), jnp.float32)}
    out = os.environ["MH_OUT"]
    resume = os.environ.get("MH_RESUME") == "1"
    steps = 4 if resume else 2
    tcfg = TrainerConfig(output_dir=out, max_steps=steps, logging_steps=1,
                         save_steps=2, bf16=False, resume=resume, seed=0)
    tr = Trainer(loss_fn, params, tcfg, OptimizerConfig(learning_rate=1e-2))
    if resume:
        # moments restored (non-zero) before any new step runs
        mu = jax.tree_util.tree_leaves(tr.opt_state)
        tr.maybe_resume()
        nz = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(tr.opt_state))
        print(f"RESUMED step={tr.step} moments_abs={nz:.6f}", flush=True)
    rs = np.random.RandomState(pid)  # each process feeds DIFFERENT rows
    def batches():
        while True:
            yield {"x": rs.randn(2, 8).astype(np.float32),
                   "y": rs.randn(2, 4).astype(np.float32)}
    log = tr.train(batches())
    print(f"FINAL pid={pid} step={tr.step} loss={log.get('loss')}", flush=True)
""")


def _run_pair(tmp_path, resume: bool):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        **os.environ,
        "DEXBOTIC_COORDINATOR": f"127.0.0.1:{port}",
        "DEXBOTIC_NUM_PROCESSES": "2",
        "MH_OUT": str(tmp_path / "out"),
        "MH_REPO": REPO,
        "MH_RESUME": "1" if resume else "0",
    }
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER],
            env={**env, "DEXBOTIC_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-3000:]}"
    return outs


@pytest.mark.heavy
def test_two_process_train_and_resume(tmp_path):
    outs = _run_pair(tmp_path, resume=False)
    assert "FINAL pid=0 step=2" in outs[0]
    assert "FINAL pid=1 step=2" in outs[1]
    ckpt = tmp_path / "out" / "checkpoint-2"
    assert (ckpt / "params").exists() and (ckpt / "opt_state").exists()
    # primary-only logging: metrics.jsonl written once, by process 0
    metrics = (tmp_path / "out" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) == 2
    assert '"step": 1' in outs[0] and '"step": 1' not in outs[1]

    outs = _run_pair(tmp_path, resume=True)
    for o in outs:
        assert "RESUMED step=2" in o
        # restored moments are the saved ones, not re-init zeros
        nz = float(o.split("moments_abs=")[1].split()[0])
        assert nz > 0.0
    assert "FINAL pid=0 step=4" in outs[0]


RL_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["MH_REPO"])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                           "--xla_cpu_max_isa=AVX512")  # host-portable cache (conftest note)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.environ["MH_REPO"], "tests", ".jax_test_cache",
        "mh" + os.environ["DEXBOTIC_PROCESS_ID"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    from dexbotic_tpu.parallel import multihost
    assert multihost.maybe_initialize()
    import numpy as np
    from dexbotic_tpu.exp.rl.rl_trainer import RolloutBuffer, allgather_rollouts

    pid = jax.process_index()
    # UNEVEN counts and UNEVEN prompt lengths across processes
    n = 3 if pid == 0 else 2
    buf = RolloutBuffer(n, max_chunks=2, obs_shapes={"images": (4, 4, 3)},
                        tokens_per_chunk=5)
    buf.input_ids = np.full((n, 6 + pid), pid * 100 + 7, np.int32)
    buf.prompt_valid = np.ones((n, 6 + pid), np.int32)
    buf.bins[:] = pid * 100 + np.arange(n)[:, None, None]
    buf.success[:] = pid
    buf.truncated[:] = 0.0
    buf.group_index[:] = np.arange(n) + pid * 10
    g = allgather_rollouts(buf, pad_prompt_to=8)
    assert g.n == 5, g.n
    assert g.input_ids.shape == (5, 8), g.input_ids.shape
    assert list(g.success) == [0.0, 0.0, 0.0, 1.0, 1.0], list(g.success)
    assert list(g.group_index) == [0, 1, 2, 10, 11], list(g.group_index)
    assert g.bins[3, 0, 0] == 100 and g.bins[2, 0, 0] == 2
    assert g.obs["images"].shape == (5, 2, 4, 4, 3)
    # replicated determinism: both processes must hold the identical union
    print(f"RLGATHER ok sum={int(g.bins.sum())} ids={int(g.input_ids.sum())}",
          flush=True)
""")


@pytest.mark.heavy
def test_two_process_uneven_rollout_allgather(tmp_path):
    """allgather_rollouts with DIFFERENT per-process episode counts and
    prompt lengths: pads, gathers, compacts; both hosts hold the identical
    union in process order (VERDICT r3 #10)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        **os.environ,
        "DEXBOTIC_COORDINATOR": f"127.0.0.1:{port}",
        "DEXBOTIC_NUM_PROCESSES": "2",
        "MH_REPO": REPO,
    }
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", RL_WORKER],
            env={**env, "DEXBOTIC_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-3000:]}"
    lines = [next(l for l in o.splitlines() if l.startswith("RLGATHER ok"))
             for o in outs]
    assert lines[0] == lines[1], lines  # identical union on every host


SKEW_WORKER = textwrap.dedent("""
    import json, os, sys, time
    sys.path.insert(0, os.environ["MH_REPO"])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                           "--xla_cpu_max_isa=AVX512")  # host-portable cache (conftest note)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.environ["MH_REPO"], "tests", ".jax_test_cache",
        "mh" + os.environ["DEXBOTIC_PROCESS_ID"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    from dexbotic_tpu.parallel import multihost
    assert multihost.maybe_initialize()
    import jax.numpy as jnp
    import numpy as np
    from dexbotic_tpu.exp.optim import OptimizerConfig
    from dexbotic_tpu.exp.trainer import Trainer, TrainerConfig

    pid = jax.process_index()

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2), {}

    params = {"w": jnp.ones((8, 4), jnp.float32)}
    tcfg = TrainerConfig(output_dir=os.environ["MH_OUT"], max_steps=3,
                         logging_steps=1, save_steps=1, bf16=False, seed=0)
    tr = Trainer(loss_fn, params, tcfg, OptimizerConfig(learning_rate=1e-2))
    rs = np.random.RandomState(pid)
    def batches():
        while True:
            # the PRIMARY is the slow host: the non-primary reaches every
            # save/log point first and must not race ahead of (or clobber)
            # the primary-only writes
            if pid == 0:
                time.sleep(0.5)
            yield {"x": rs.randn(2, 8).astype(np.float32),
                   "y": rs.randn(2, 4).astype(np.float32)}
    tr.train(batches())
    print(f"SKEWED pid={pid} step={tr.step}", flush=True)
""")


@pytest.mark.heavy
def test_two_process_skewed_primary_writes(tmp_path):
    """Primary-only-write discipline under host skew: the non-primary runs
    ~fast, the primary sleeps 0.5 s per batch and saves EVERY step.  Both
    must finish (no deadlock), every checkpoint must be complete, and
    metrics.jsonl must be written exactly once per step by the primary only
    (VERDICT r3 #10)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        **os.environ,
        "DEXBOTIC_COORDINATOR": f"127.0.0.1:{port}",
        "DEXBOTIC_NUM_PROCESSES": "2",
        "MH_OUT": str(tmp_path / "out"),
        "MH_REPO": REPO,
    }
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", SKEW_WORKER],
            env={**env, "DEXBOTIC_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-3000:]}"
    assert "SKEWED pid=0 step=3" in outs[0]
    assert "SKEWED pid=1 step=3" in outs[1]
    for step in (1, 2, 3):
        ckpt = tmp_path / "out" / f"checkpoint-{step}"
        assert (ckpt / "params").exists() and (ckpt / "opt_state").exists(), step
    metrics = (tmp_path / "out" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) == 3, metrics
