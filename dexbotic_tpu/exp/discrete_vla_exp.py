"""Discrete VLA experiment (reference: exp/discrete_vla_exp.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.trainer import load_checkpoint_params
from dexbotic_tpu.models import presets
from dexbotic_tpu.models.discrete_vla import (
    DiscreteVLAConfig,
    discrete_vla_inference_action,
    discrete_vla_loss,
    init_discrete_vla,
)
from dexbotic_tpu.models.vlm import VLMConfig


@dataclass
class DiscreteVLAModelConfig(base_exp.Config):
    model_name_or_path: Optional[str] = None
    llm_preset: str = "llama2_7b"
    vit_preset: str = "clip_vit_l_336"
    mm_projector_type: str = "mlp2x_gelu"
    action_dim: int = 7
    vocab_bins: int = 255
    seed: int = 0

    def build_config(self) -> DiscreteVLAConfig:
        return DiscreteVLAConfig(
            vlm=VLMConfig(
                llm=presets.LLM_PRESETS[self.llm_preset],
                vit=presets.VIT_PRESETS[self.vit_preset],
                projector_type=self.mm_projector_type,
            ),
            action_dim=self.action_dim,
            vocab_bins=self.vocab_bins,
        )

    def build_params(self, cfg):
        if self.model_name_or_path:
            return load_checkpoint_params(self.model_name_or_path)
        return init_discrete_vla(jax.random.PRNGKey(self.seed), cfg)


@dataclass
class DiscreteVLAExp(base_exp.BaseExp):
    exp_name: str = "discrete_vla"
    model: DiscreteVLAModelConfig = field(default_factory=DiscreteVLAModelConfig)
    # action strings come from ActionNormAnd2String (vocab_size=255 bins)
    action: base_exp.ActionConfig = field(
        default_factory=lambda: base_exp.ActionConfig(trajectory_length=1)
    )

    def num_image_tokens(self) -> int:
        return self.model.build_config().vlm.num_image_tokens

    def build_model(self, tokenizer):
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)

        def loss_fn(params, batch, rng):
            return discrete_vla_loss(
                params, cfg, batch, rng, remat=self.trainer.gradient_checkpointing
            )

        return cfg, params, loss_fn

    def inference(self):
        """HTTP text-action server; serve_micro_batch>0 enables the
        continuous-batching decode engine (slot count = that value)."""
        import json
        import os

        from dexbotic_tpu.exp.serve import DiscreteVLAServer

        cfg = self.model.build_config()
        params = self.prepare_inference_params(self.model.build_params(cfg))
        tokenizer = self.tokenizer.build_tokenizer()
        norms = None
        if self.model.model_name_or_path:
            p = os.path.join(self.model.model_name_or_path, "norm_stats.json")
            if os.path.exists(p):
                norms = json.load(open(p))["norm_stats"]["default"]
        DiscreteVLAServer(
            self, cfg, params, tokenizer, norms,
            continuous_batching=self.serve_micro_batch,
        ).run()


if __name__ == "__main__":
    DiscreteVLAExp.main()
