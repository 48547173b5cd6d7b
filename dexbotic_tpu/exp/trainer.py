"""Trainer: jitted GSPMD train step, grad accumulation, Orbax checkpointing.

Replaces the reference's HF-Trainer + DeepSpeed stack
(/root/reference/dexbotic/exp/trainer.py): fully-sharded params over the
'data' mesh axis (ZeRO-3 analogue via GSPMD), per-module LR groups,
non-reentrant-equivalent rematerialization inside the model, grad clip 1.0,
auxiliary *_loss metrics surfaced every log step, checkpoint-{step} dirs with
norm_stats.json embedded so inference is self-contained, and auto-resume from
the newest checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import time
from functools import partial
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding

from dexbotic_tpu.exp.optim import OptimizerConfig, build_optimizer
from dexbotic_tpu.parallel import multihost
from dexbotic_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_shardings,
    make_mesh,
    replicated,
    tp_fsdp_shardings,
)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    output_dir: str = "./output"
    max_steps: int = 1000
    per_device_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    logging_steps: int = 10
    save_steps: int = 500
    save_total_limit: Optional[int] = None
    seed: int = 42
    bf16: bool = True
    gradient_checkpointing: bool = False
    mesh_data: Optional[int] = None  # default: all devices
    mesh_model: int = 1
    resume: bool = True
    save_optimizer: bool = True  # persist moments for bit-exact resume
    wandb_project: Optional[str] = None  # uses WANDB_PROJECT env if unset
    # adapter-only checkpoints: save just the mm-projector subtree (+ norm
    # stats), the reference's tune_mm_mlp_adapter mode writing only
    # mm_projector.bin (exp/trainer.py:38-86)
    adapter_save: bool = False


class Trainer:
    """Functional training loop around a loss_fn(params, batch, rng)."""

    def __init__(
        self,
        loss_fn: Callable,  # (params, batch, rng[, aux_state]) -> (loss, metrics[, new_aux])
        params,
        trainer_config: TrainerConfig,
        optimizer_config: OptimizerConfig,
        norm_stats_json: Optional[str] = None,
        mesh=None,
        aux_state=None,  # stateful-model carry (e.g. MemVLA bank), threaded
    ):
        self.cfg = trainer_config
        self.opt_cfg = optimizer_config
        self.loss_fn = loss_fn
        self.norm_stats_json = norm_stats_json
        self.mesh = mesh if mesh is not None else make_mesh(
            data=trainer_config.mesh_data, model=trainer_config.mesh_model
        )

        if optimizer_config.freeze_mm_vision:
            # frozen tower: cut its backward graph, not just its update —
            # see optim.stopgrad_subtrees (memory: GBs of stashed fp32 ViT
            # activations otherwise; the optimizer mask alone cannot free
            # them)
            from dexbotic_tpu.exp.optim import stopgrad_subtrees

            inner_loss = self.loss_fn

            def loss_fn_sg(params, *rest):
                return inner_loss(
                    stopgrad_subtrees(params, ("vit", "mm_vision")), *rest)

            self.loss_fn = loss_fn_sg

        if trainer_config.bf16:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2
                else x,
                params,
            )
        if self.mesh.shape["model"] > 1:
            self.param_shardings = tp_fsdp_shardings(params, self.mesh)
        else:
            self.param_shardings = fsdp_shardings(params, self.mesh)
        self.params = jax.tree.map(jax.device_put, params, self.param_shardings)

        self.tx = build_optimizer(optimizer_config, self.params, trainer_config.max_steps)
        # fp32 optimizer moments even for bf16 params (updates come back
        # fp32; mismatched moment dtypes would silently retrigger compiles)
        _opt_init = lambda p: self.tx.init(  # noqa: E731
            jax.tree.map(lambda x: x.astype(jnp.float32), p)
        )
        # explicit fsdp shardings for the moments (the ZeRO moment partition):
        # without out_shardings the jit'd init returns constant zero arrays
        # with uncommitted single-device placement, which breaks multi-host
        # resume and leaves moment layout to chance
        opt_abs = jax.eval_shape(_opt_init, self.params)
        shard_fn = tp_fsdp_shardings if self.mesh.shape["model"] > 1 else fsdp_shardings
        self.opt_shardings = shard_fn(opt_abs, self.mesh)
        with self.mesh:
            self.opt_state = jax.jit(
                _opt_init, out_shardings=self.opt_shardings
            )(self.params)
        self.step = 0
        self.rng = jax.random.PRNGKey(trainer_config.seed)
        self.aux_state = aux_state
        self._batch_sharding = batch_sharding(self.mesh)
        self._train_step = self._build_train_step(with_aux=aux_state is not None)
        self._ckptr = ocp.PyTreeCheckpointer()
        self._metrics_file = None
        self._wandb = self._init_wandb()

    # ------------------------------------------------------------------

    def _build_train_step(self, with_aux: bool = False):
        accum = self.cfg.gradient_accumulation_steps
        b_shard = batch_sharding(self.mesh)
        r_shard = replicated(self.mesh)

        if with_aux:
            # stateful models: loss_fn(params, batch, rng, aux) ->
            # (loss, (metrics, new_aux)); no grad accumulation (state order)
            def aux_step(params, opt_state, aux, batch, rng):
                def lf(p):
                    loss, metrics, new_aux = self.loss_fn(p, batch, rng, aux)
                    return loss, (metrics, new_aux)

                (loss, (metrics, new_aux)), grads = jax.value_and_grad(
                    lf, has_aux=True
                )(params)
                grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                metrics = dict(metrics)
                metrics["grad_norm"] = optax.global_norm(grads)
                metrics["loss"] = loss
                return params, opt_state, new_aux, metrics

            # shardings inherited from the args (params were device_put with
            # fsdp shardings at init; aux/batch follow data placement)
            return jax.jit(aux_step, donate_argnums=(0, 1, 2))

        def microbatch_grads(params, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch, rng
            )
            return grads, loss, metrics

        def train_step(params, opt_state, batch, rng):
            if accum == 1:
                grads, loss, metrics = microbatch_grads(params, batch, rng)
            else:
                # batch leading dim = accum * microbatch; scan over microbatches
                def body(carry, xs):
                    g_acc, l_acc = carry
                    mb, r = xs
                    g, l, m = microbatch_grads(params, mb, r)
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                    return (g_acc, l_acc + l), m

                mbs = jax.tree.map(
                    lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                    batch,
                )
                rngs = jax.random.split(rng, accum)
                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, loss), metrics = jax.lax.scan(body, (zero, 0.0), (mbs, rngs))
                grads = jax.tree.map(lambda g: g / accum, grads)
                loss = loss / accum
                metrics = jax.tree.map(lambda m: m[-1], metrics)

            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["loss"] = loss
            return params, opt_state, metrics

        return jax.jit(
            train_step,
            in_shardings=(self.param_shardings, self.opt_shardings, b_shard, r_shard),
            out_shardings=(self.param_shardings, self.opt_shardings, None),
            donate_argnums=(0, 1),
        )

    # ------------------------------------------------------------------

    def train(self, data_iter: Iterable[dict], max_steps: Optional[int] = None):
        """Run the loop; data_iter yields collated numpy batches."""
        max_steps = max_steps or self.cfg.max_steps
        if self.cfg.resume:
            self.maybe_resume()
        t0 = time.time()
        log = {}
        with self.mesh:
            for batch in data_iter:
                if self.step >= max_steps:
                    break
                # resume-invariant per-step stream: fold_in(seed, step) gives
                # the same draw for step N whether or not training restarted
                # (sequential splits would replay the start-of-training noise
                # after resume; ADVICE r1)
                step_rng = jax.random.fold_in(self.rng, self.step)
                batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
                if jax.process_count() > 1:
                    # each process fed its own rows; assemble the global batch
                    batch = multihost.local_batch_to_global(
                        batch, self._batch_sharding
                    )
                if self.aux_state is not None:
                    (self.params, self.opt_state, self.aux_state, metrics) = (
                        self._train_step(
                            self.params, self.opt_state, self.aux_state, batch, step_rng
                        )
                    )
                else:
                    self.params, self.opt_state, metrics = self._train_step(
                        self.params, self.opt_state, batch, step_rng
                    )
                self.step += 1
                if self.step % self.cfg.logging_steps == 0 or self.step == max_steps:
                    log = {k: float(v) for k, v in metrics.items()}
                    log["step"] = self.step
                    log["steps_per_sec"] = self.cfg.logging_steps / max(
                        1e-9, time.time() - t0
                    )
                    t0 = time.time()
                    if multihost.is_primary():
                        print(json.dumps(log))
                        self._log_metrics(log)
                if self.step % self.cfg.save_steps == 0 or self.step == max_steps:
                    self.save_checkpoint()
        return log

    # ------------------------------------------------------------------

    def _init_wandb(self):
        """Optional W&B (reference: WANDB_PROJECT env + HF Trainer hook,
        exp/base_exp.py:243,264-265); JSONL metrics always written.
        NOTE: wired but UNEXERCISED in this offline environment (no network,
        wandb not installed) — metrics.jsonl is the tested logging path."""
        project = self.cfg.wandb_project or os.environ.get("WANDB_PROJECT")
        if not project or not multihost.is_primary():
            return None
        try:
            import wandb  # noqa: PLC0415

            return wandb.init(project=project, dir=self.cfg.output_dir)
        except Exception:  # noqa: BLE001 (offline / not installed)
            return None

    def _log_metrics(self, log: dict):
        if self._metrics_file is None:
            os.makedirs(self.cfg.output_dir, exist_ok=True)
            self._metrics_file = open(
                os.path.join(self.cfg.output_dir, "metrics.jsonl"), "a"
            )
        self._metrics_file.write(json.dumps(log) + "\n")
        self._metrics_file.flush()
        if self._wandb is not None:
            self._wandb.log(log, step=self.step)

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.cfg.output_dir, f"checkpoint-{step}")

    def save_checkpoint(self):
        path = os.path.abspath(self._ckpt_dir(self.step))
        if self.cfg.adapter_save:
            adapter = extract_adapter(multihost.host_copy(self.params))
            assert adapter, "adapter_save: no projector params found"
            self._ckptr.save(os.path.join(path, "adapter"), adapter, force=True)
            if multihost.is_primary():
                os.makedirs(path, exist_ok=True)
                with open(os.path.join(path, "trainer_state.json"), "w") as f:
                    json.dump({"step": self.step, "adapter_only": True}, f)
                if self.norm_stats_json is not None:
                    with open(os.path.join(path, "norm_stats.json"), "w") as f:
                        f.write(self.norm_stats_json)
                self._prune_checkpoints()
            multihost.sync("checkpoint")
            return
        # gather-to-host fp32-free save: params as-is (bf16), like ZeRO-3's
        # 16-bit gather-on-save (exp/utils.py:10-21); on multi-host the
        # gather crosses processes and only the primary writes
        host_params = multihost.host_copy(self.params)
        host_opt = None
        if self.cfg.save_optimizer:
            # optax states are namedtuple pytrees; persist leaves positionally
            # so restore can rebuild via the freshly-init state's treedef
            # (reference keeps full ZeRO optimizer partitions in its ckpts)
            leaves = jax.tree_util.tree_leaves(self.opt_state)
            host_opt = {
                str(i): x for i, x in enumerate(multihost.host_copy(leaves))
            }
        # orbax is multihost-aware: every process calls save (internal
        # barriers), only the primary actually writes
        self._ckptr.save(os.path.join(path, "params"), host_params, force=True)
        if host_opt is not None:
            self._ckptr.save(os.path.join(path, "opt_state"), host_opt, force=True)
        if multihost.is_primary():
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "trainer_state.json"), "w") as f:
                json.dump({"step": self.step}, f)
            if self.norm_stats_json is not None:
                with open(os.path.join(path, "norm_stats.json"), "w") as f:
                    f.write(self.norm_stats_json)
            self._prune_checkpoints()
        multihost.sync("checkpoint")

    def _prune_checkpoints(self):
        if not self.cfg.save_total_limit:
            return
        ckpts = sorted(
            (
                int(m.group(1))
                for d in os.listdir(self.cfg.output_dir)
                if (m := re.match(r"checkpoint-(\d+)$", d))
            )
        )
        import shutil

        for step in ckpts[: -self.cfg.save_total_limit]:
            shutil.rmtree(self._ckpt_dir(step), ignore_errors=True)

    def latest_checkpoint(self) -> Optional[str]:
        if not os.path.isdir(self.cfg.output_dir):
            return None
        ckpts = sorted(
            (
                int(m.group(1))
                for d in os.listdir(self.cfg.output_dir)
                if (m := re.match(r"checkpoint-(\d+)$", d))
            )
        )
        return self._ckpt_dir(ckpts[-1]) if ckpts else None

    def maybe_resume(self):
        path = self.latest_checkpoint()
        if path is None:
            return False
        if os.path.isdir(os.path.join(path, "adapter")):
            host_adapter = self._ckptr.restore(
                os.path.abspath(os.path.join(path, "adapter"))
            )
            self.params = apply_adapter(self.params, host_adapter)
            self.params = jax.tree.map(jax.device_put, self.params, self.param_shardings)
            with open(os.path.join(path, "trainer_state.json")) as f:
                self.step = json.load(f)["step"]
            print(f"resumed adapter-only checkpoint from {path} at step {self.step}")
            return True
        host = self._ckptr.restore(os.path.abspath(os.path.join(path, "params")))
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x), s), host, self.param_shardings
        )
        with open(os.path.join(path, "trainer_state.json")) as f:
            self.step = json.load(f)["step"]
        # moments: fresh zeros from __init__ unless the checkpoint carries them
        opt_path = os.path.abspath(os.path.join(path, "opt_state"))
        if os.path.isdir(opt_path):
            host_opt = self._ckptr.restore(opt_path)
            flat, treedef = jax.tree_util.tree_flatten(self.opt_state)
            flat_sh = jax.tree_util.tree_leaves(
                self.opt_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
            )
            if len(host_opt) == len(flat):
                restored = [
                    jax.device_put(np.asarray(host_opt[str(i)], tgt.dtype), s)
                    for i, (tgt, s) in enumerate(zip(flat, flat_sh))
                ]
                self.opt_state = jax.tree_util.tree_unflatten(treedef, restored)
            else:  # optimizer config changed since save; keep fresh init
                print("opt_state checkpoint shape mismatch; reinitialized moments")
        print(f"resumed from {path} at step {self.step}")
        return True


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def extract_adapter(params) -> dict:
    """Flat {path: leaf} of the mm-projector subtree (the 'adapter')."""
    out = {}

    def visit(path, x):
        s = _path_str(path)
        if "projector" in s:
            out[s] = np.asarray(x)
        return x

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def apply_adapter(params, adapter: dict):
    """Merge a flat adapter dict back into a full param tree by path."""
    applied = set()

    def visit(path, x):
        s = _path_str(path)
        if s in adapter:
            applied.add(s)
            return jnp.asarray(np.asarray(adapter[s]), getattr(x, "dtype", None))
        return x

    merged = jax.tree_util.tree_map_with_path(visit, params)
    missing = set(adapter) - applied
    assert not missing, f"adapter keys not found in params: {sorted(missing)[:5]}"
    return merged


def load_checkpoint_params(path: str, base_params=None):
    """Load params from a checkpoint-{step} dir (host pytree).  Adapter-only
    checkpoints (adapter_save mode) require `base_params` to merge into."""
    adapter_dir = os.path.join(path, "adapter")
    if os.path.isdir(adapter_dir):
        assert base_params is not None, (
            f"{path} is an adapter-only checkpoint; pass base_params"
        )
        adapter = ocp.PyTreeCheckpointer().restore(os.path.abspath(adapter_dir))
        return apply_adapter(base_params, adapter)
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(os.path.join(path, "params")))
