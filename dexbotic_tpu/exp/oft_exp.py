"""OFT / OFT-Discrete experiments (reference: exp/oft_exp.py, oft_discrete_exp.py)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.trainer import load_checkpoint_params
from dexbotic_tpu.models import presets
from dexbotic_tpu.models.oft import (
    OFTConfig,
    continuous_to_bins,
    init_oft,
    oft_inference_action,
    oft_loss,
)
from dexbotic_tpu.models.vlm import VLMConfig


@dataclass
class OFTModelConfig(base_exp.Config):
    model_name_or_path: Optional[str] = None
    llm_preset: str = "llama2_7b"
    vit_preset: str = "clip_vit_l_336"
    mm_projector_type: str = "mlp2x_gelu"
    action_model_type: str = "L1"  # 'L1' | 'Diffusion' | 'Discrete'
    action_dim: int = 7
    chunk_size: int = 16
    use_proprio: bool = False
    proprio_dim: Optional[int] = None
    num_bins: int = 256
    # matches the reference's discrete-decode slice off-by-one by default
    # (required for DB checkpoint replay); set False for corrected decode
    reference_parity: bool = True
    seed: int = 0

    def build_config(self) -> OFTConfig:
        return OFTConfig(
            vlm=VLMConfig(
                llm=presets.LLM_PRESETS[self.llm_preset],
                vit=presets.VIT_PRESETS[self.vit_preset],
                projector_type=self.mm_projector_type,
            ),
            action_model_type=self.action_model_type,
            action_dim=self.action_dim,
            chunk_size=self.chunk_size,
            use_proprio=self.use_proprio,
            proprio_dim=self.proprio_dim,
            num_bins=self.num_bins,
            reference_parity=self.reference_parity,
        )

    def build_params(self, cfg: OFTConfig):
        if self.model_name_or_path:
            return load_checkpoint_params(self.model_name_or_path)
        return init_oft(jax.random.PRNGKey(self.seed), cfg)


@dataclass
class OFTExp(base_exp.BaseExp):
    exp_name: str = "oft"
    model: OFTModelConfig = field(default_factory=OFTModelConfig)
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            data_keys=["input_ids", "labels", "action", "image", "state"],
        )
    )

    def num_image_tokens(self) -> int:
        return self.model.build_config().vlm.num_image_tokens

    def build_model(self, tokenizer):
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)

        def loss_fn(params, batch, rng):
            batch = dict(batch)
            if "Discrete" in cfg.action_model_type and "action_bins" not in batch:
                bins = continuous_to_bins(batch["actions"].reshape(
                    batch["actions"].shape[0], -1, cfg.action_dim)[:, : cfg.chunk_size], cfg)
                batch["action_bins"] = bins.reshape(bins.shape[0], -1) + (
                    cfg.vlm.llm.vocab_size - cfg.num_bins
                )
            return oft_loss(params, cfg, batch, rng, remat=self.trainer.gradient_checkpointing)

        return cfg, params, loss_fn

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
        @jax.jit
        def _infer(params, input_ids, valid, images, states, rng):
            return oft_inference_action(
                params, cfg, input_ids, valid, images,
                states=states if cfg.use_proprio else None, rng=rng,
            )

        return lambda *a: _infer(params, *a)

    def inference(self):
        from dexbotic_tpu.exp.serve import OFTServer

        cfg, params, norms = self.load_for_inference()
        tokenizer = self.tokenizer.build_tokenizer()
        OFTServer(self, cfg, params, tokenizer, norms,
                  micro_batch=self.serve_micro_batch).run()


@dataclass
class OFTDiscreteExp(OFTExp):
    exp_name: str = "oft_discrete"
    model: OFTModelConfig = field(
        default_factory=lambda: OFTModelConfig(action_model_type="Discrete")
    )


if __name__ == "__main__":
    OFTExp.main()
