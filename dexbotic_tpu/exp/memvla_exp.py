"""MemVLA experiment (reference: exp/memvla_exp.py).

Memory config surface (:166-260) + episode-ordered training via
exp/mem_trainer.py (parallel_stream default) and a stateful serving loop
that resets the bank on episode_first_frame.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.mem_trainer import episode_batches
from dexbotic_tpu.exp.trainer import load_checkpoint_params
from dexbotic_tpu.models import presets
from dexbotic_tpu.models.memvla import (
    MemVLAConfig,
    init_mem_state,
    init_memvla,
    memvla_inference_action,
    memvla_loss,
    reset_mem_rows,
)
from dexbotic_tpu.models.vlm import VLMConfig


@dataclass
class MemVLAModelConfig(base_exp.Config):
    model_name_or_path: Optional[str] = None
    llm_preset: str = "llama2_7b"
    vit_preset: str = "clip_vit_l_336"
    mm_projector_type: str = "mlp2x_gelu"
    action_model_type: str = "DiT-B"
    action_dim: int = 7
    chunk_size: int = 16
    # memory config surface (memvla_exp.py:166-260)
    per_token_size: int = 256
    mem_length: int = 16
    retrieval_layers: int = 2
    use_timestep_pe: bool = True
    fusion_type: str = "gate"
    consolidate_type: str = "tome"
    update_fused: bool = True
    dataloader_type: str = "parallel_stream"
    group_size: int = 8
    seed: int = 0

    def build_config(self) -> MemVLAConfig:
        return MemVLAConfig(
            vlm=VLMConfig(
                llm=presets.LLM_PRESETS[self.llm_preset],
                vit=presets.VIT_PRESETS[self.vit_preset],
                projector_type=self.mm_projector_type,
            ),
            action_model_type=self.action_model_type,
            action_dim=self.action_dim,
            chunk_size=self.chunk_size,
            per_token_size=self.per_token_size,
            mem_length=self.mem_length,
            retrieval_layers=self.retrieval_layers,
            use_timestep_pe=self.use_timestep_pe,
            fusion_type=self.fusion_type,
            consolidate_type=self.consolidate_type,
            update_fused=self.update_fused,
        )

    def build_params(self, cfg):
        if self.model_name_or_path:
            return load_checkpoint_params(self.model_name_or_path)
        return init_memvla(jax.random.PRNGKey(self.seed), cfg)


@dataclass
class MemVLAExp(base_exp.BaseExp):
    exp_name: str = "memvla"
    model: MemVLAModelConfig = field(default_factory=MemVLAModelConfig)

    def num_image_tokens(self) -> int:
        return self.model.build_config().vlm.num_image_tokens

    def build_model(self, tokenizer):
        """Stateful loss: the bank state is threaded through the Trainer's
        aux-state carry (Trainer(aux_state=...), exp/trainer.py).  'group'/
        'stream' dataloader modes use the sequential single-bank semantics
        (batch rows are consecutive frames of one episode,
        memvla_arch.py:329-360); 'parallel_stream' keeps per-row banks."""
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)
        sequential = self.model.dataloader_type in ("group", "stream")

        def loss_fn(params, batch, rng, state):
            # per-row episode reset + in-episode frame index from the
            # episode-ordered schedule (mem_trainer.episode_batches)
            loss, metrics, new_state = memvla_loss(
                params, cfg, batch, state, rng, sequential_bank=sequential
            )
            new_state = jax.lax.stop_gradient(new_state)
            return loss, metrics, new_state

        return cfg, params, loss_fn

    def build_aux_state(self, batch_size: int):
        # group/stream: ONE shared episode bank regardless of batch size
        if self.model.dataloader_type in ("group", "stream"):
            batch_size = 1
        return init_mem_state(self.model.build_config(), batch_size)

    def make_data_schedule(self, dataset, batch_size):
        return episode_batches(
            dataset, batch_size, mode=self.model.dataloader_type,
            group_size=self.model.group_size, seed=self.trainer.seed,
        )

    def load_for_inference(self):
        return _memvla_load_for_inference(self)

    def inference(self):
        """Stateful action server (memvla_exp.py:309-358 contract:
        'episode_first_frame' form field resets the memory bank)."""
        from dexbotic_tpu.exp.serve import MemVLAServer

        cfg, params, norms = self.load_for_inference()
        tokenizer = self.tokenizer.build_tokenizer()
        MemVLAServer(self, cfg, params, tokenizer, norms).run()

    def train(self):
        """Episode-ordered training: batches follow the mem-trainer schedule,
        carry in-episode frame indices as 'timesteps' and per-row
        'episode_reset' flags; the bank state threads through the Trainer
        aux-state carry (exp/mem_trainer.py + exp/trainer.py)."""
        import numpy as np

        from dexbotic_tpu.data.collator import Collator
        from dexbotic_tpu.exp.trainer import Trainer

        self._auto_compute_norm_stats()
        tokenizer = self.tokenizer.build_tokenizer()
        cfg, params, loss_fn = self.build_model(tokenizer)
        action_fn = self.action.build_action_process_func()
        dataset = self.data.build_data(self.build_tokenization(tokenizer), action_fn)
        collator = Collator(
            pad_token_id=tokenizer.pad_token_id,
            max_length=self.tokenizer.model_max_length,
        )
        with open(self.action.statistic_mapping) as f:
            norm_stats_json = f.read()

        B = self.trainer.per_device_batch_size
        mode = self.model.dataloader_type
        if mode == "group":
            assert B == self.model.group_size, (
                f"'group' mode trains one group per step: set "
                f"per_device_batch_size ({B}) == group_size "
                f"({self.model.group_size})"
            )
        if mode in ("group", "stream"):
            # the batch is consecutive frames of ONE episode scanned against
            # a single shared bank — rows cannot be data-sharded
            assert self.trainer.mesh_data in (None, 1), (
                f"'{mode}' mode is sequential within the batch; use "
                f"mesh_data=1 (got {self.trainer.mesh_data})"
            )
        trainer = Trainer(
            loss_fn, params, self.trainer, self.optimizer,
            norm_stats_json=norm_stats_json,
            aux_state=self.build_aux_state(B),
        )

        def batches():
            while True:  # loop the schedule for multiple epochs
                any_batch = False
                for sched in self.make_data_schedule(dataset, B):
                    if len(sched) < B:
                        continue
                    any_batch = True
                    items = [dataset[i] for i, _ in sched]
                    batch = collator(items)
                    batch["timesteps"] = np.asarray(
                        [float(dataset.global_index[i][2]) for i, _ in sched],
                        np.float32,
                    )
                    resets = [start for _, start in sched]
                    if mode == "group":
                        # the reference clears ALL banks at the head of every
                        # 'group' forward (memvla_arch.py:330-333)
                        resets[0] = True
                    batch["episode_reset"] = np.asarray(resets, bool)
                    yield batch
                if not any_batch:
                    return

        return trainer.train(batches())


def _memvla_load_for_inference(exp: "MemVLAExp"):
    import json
    import os

    cfg = exp.model.build_config()
    params = exp.prepare_inference_params(exp.model.build_params(cfg))
    norms = None
    if exp.model.model_name_or_path:
        p = os.path.join(exp.model.model_name_or_path, "norm_stats.json")
        if os.path.exists(p):
            norms = json.load(open(p))["norm_stats"]["default"]
    return cfg, params, norms


class MemVLAInferenceSession:
    """Serving-side stateful session (cur_timestep + bank state)."""

    def __init__(self, exp: MemVLAExp, cfg, params, batch_size: int = 1):
        self.cfg = cfg
        self.params = params
        self.state = init_mem_state(cfg, batch_size)
        self.timestep = 0

        @jax.jit
        def infer(params, ids, valid, images, state, t, rng):
            return memvla_inference_action(params, cfg, ids, valid, images, state, t, rng)

        self._infer = infer

    def reset(self):
        self.state = reset_mem_rows(
            self.state, jnp.ones((self.state["cog"]["count"].shape[0],), bool)
        )
        self.timestep = 0

    def step(self, input_ids, valid, images, rng):
        t = jnp.full((input_ids.shape[0],), float(self.timestep))
        actions, self.state = self._infer(
            self.params, input_ids, valid, images, self.state, t, rng
        )
        self.timestep += 1
        return actions


if __name__ == "__main__":
    MemVLAExp.main()
