"""CogACT experiment (reference: /root/reference/dexbotic/exp/cogact_exp.py).

Defaults mirror the reference: DiT-B head, action_dim 7, chunk 16,
CLIP-L-336 tower + mlp2x_gelu projector on a 7B LLaVA-style LLM; '*_test'
presets swap in CI-sized modules.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.trainer import load_checkpoint_params
from dexbotic_tpu.models import presets
from dexbotic_tpu.models.cogact import (
    CogActConfig,
    cogact_inference_action,
    cogact_loss,
    denorm_actions,
    init_cogact,
)
from dexbotic_tpu.models.vlm import VLMConfig


@dataclass
class CogActModelConfig(base_exp.Config):
    model_name_or_path: Optional[str] = None  # checkpoint-{step} dir to load
    llm_preset: str = "llama2_7b"
    vit_preset: str = "clip_vit_l_336"
    mm_projector_type: str = "mlp2x_gelu"
    action_model_type: str = "DiT-B"
    action_dim: int = 7
    chunk_size: int = 16
    freeze_llm: bool = False
    freeze_mm_projector: bool = False
    freeze_mm_vision: bool = True
    seed: int = 0
    sampler: str = "ddim"  # 'dpm' = DPM-Solver++(2M); pair with ddim_steps=5
    ddim_steps: int = 10
    # one-launch Pallas sampler (ops/dit_fused.py): the B=1 serving-latency
    # kernel; exact parity with the XLA sampler (tests/test_dit_fused.py).
    # Default ON — dispatch self-guards (TPU backend, rows<=4, no mem xattn).
    fused_sampler: bool = True

    def build_config(self) -> CogActConfig:
        return CogActConfig(
            vlm=VLMConfig(
                llm=presets.LLM_PRESETS[self.llm_preset],
                vit=presets.VIT_PRESETS[self.vit_preset],
                projector_type=self.mm_projector_type,
            ),
            action_model_type=self.action_model_type,
            action_dim=self.action_dim,
            chunk_size=self.chunk_size,
            sampler=self.sampler,
            ddim_steps=self.ddim_steps,
            fused_sampler=self.fused_sampler,
        )

    def build_params(self, cfg: CogActConfig):
        if self.model_name_or_path:
            return load_checkpoint_params(self.model_name_or_path)
        return init_cogact(jax.random.PRNGKey(self.seed), cfg)


@dataclass
class CogActExp(base_exp.BaseExp):
    exp_name: str = "cogact"
    model: CogActModelConfig = field(default_factory=CogActModelConfig)
    action: base_exp.ActionConfig = field(
        default_factory=lambda: base_exp.ActionConfig(trajectory_length=16)
    )

    def num_image_tokens(self) -> int:
        return self.model.build_config().vlm.num_image_tokens

    def build_model(self, tokenizer):
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)
        # freeze flags -> zero-lr groups (exp/base_exp.py:289-331 analogue)
        if self.model.freeze_mm_vision and self.optimizer.mm_vision_lr is None:
            self.optimizer = dataclasses.replace(self.optimizer, mm_vision_lr=0.0)
        if self.model.freeze_mm_projector:
            self.optimizer = dataclasses.replace(self.optimizer, mm_projector_lr=0.0)

        def loss_fn(params, batch, rng):
            return cogact_loss(
                params, cfg, batch, rng, remat=self.trainer.gradient_checkpointing
            )

        return cfg, params, loss_fn

    # ------------------------------------------------------------------

    def load_for_inference(self):
        import json
        import os

        cfg = self.model.build_config()
        params = self.prepare_inference_params(self.model.build_params(cfg))
        norms = None
        if self.model.model_name_or_path:
            p = os.path.join(self.model.model_name_or_path, "norm_stats.json")
            if os.path.exists(p):
                norms = json.load(open(p))["norm_stats"]["default"]
        return cfg, params, norms

    def make_infer_fn(self, cfg, params):
        """One jitted frame->chunk function (params passed as an argument so
        they are NOT baked into the compiled program as constants)."""

        @jax.jit
        def _infer(params, input_ids, valid, images, rng):
            return cogact_inference_action(params, cfg, input_ids, valid, images, rng)

        return lambda ids, valid, images, rng: _infer(params, ids, valid, images, rng)

    def inference(self):
        from dexbotic_tpu.exp.serve import CogActServer

        cfg, params, norms = self.load_for_inference()
        tokenizer = self.tokenizer.build_tokenizer()
        server = CogActServer(self, cfg, params, tokenizer, norms,
                              micro_batch=self.serve_micro_batch)
        server.run()

    def inference_single(self, image=None, prompt: str = "pick up the object"):
        import numpy as np

        from dexbotic_tpu.exp.serve import prepare_cogact_inputs

        cfg, params, norms = self.load_for_inference()
        tokenizer = self.tokenizer.build_tokenizer()
        if image is None:
            image = np.zeros((224, 224, 3), np.uint8)
        ids, valid, imgs = prepare_cogact_inputs(
            self, cfg, tokenizer, [image], prompt
        )
        infer = self.make_infer_fn(cfg, params)
        out = infer(ids, valid, imgs, jax.random.PRNGKey(0))
        actions = jax.device_get(out)[0]
        if norms is not None:
            actions = jax.device_get(
                denorm_actions(jnp.asarray(actions), norms["min"], norms["max"])
            )
        print(actions.tolist())
        return actions


if __name__ == "__main__":
    CogActExp.main()
