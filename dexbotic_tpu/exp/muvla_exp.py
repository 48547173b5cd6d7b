"""MUVLA experiment (reference: exp/muvla_exp.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.trainer import load_checkpoint_params
from dexbotic_tpu.models import presets
from dexbotic_tpu.models.muvla import MUVLAConfig, init_muvla, muvla_loss
from dexbotic_tpu.models.vlm import VLMConfig


@dataclass
class MUVLAModelConfig(base_exp.Config):
    model_name_or_path: Optional[str] = None
    llm_preset: str = "llama2_7b"
    vit_preset: str = "clip_vit_l_336"  # map tower
    obs_vit_preset: str = "clip_vit_l_336"
    mm_projector_type: str = "mlp2x_gelu"
    inter_dim: int = 1024
    num_history_queries: int = 192
    fuse_heads: Optional[int] = None
    seed: int = 0

    def build_config(self) -> MUVLAConfig:
        return MUVLAConfig(
            vlm=VLMConfig(
                llm=presets.LLM_PRESETS[self.llm_preset],
                vit=presets.VIT_PRESETS[self.vit_preset],
                projector_type=self.mm_projector_type,
            ),
            obs_vit=presets.VIT_PRESETS[self.obs_vit_preset],
            inter_dim=self.inter_dim,
            num_history_queries=self.num_history_queries,
            fuse_heads=self.fuse_heads,
        )

    def build_params(self, cfg):
        if self.model_name_or_path:
            return load_checkpoint_params(self.model_name_or_path)
        return init_muvla(jax.random.PRNGKey(self.seed), cfg)


@dataclass
class MUVLAExp(base_exp.BaseExp):
    exp_name: str = "muvla"
    model: MUVLAModelConfig = field(default_factory=MUVLAModelConfig)
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            data_keys=["input_ids", "labels", "image", "reward"],
        )
    )

    def num_image_tokens(self) -> int:
        cfg = self.model.build_config()
        return cfg.num_history_queries + cfg.obs_vit.num_output_tokens

    def build_model(self, tokenizer):
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)

        def loss_fn(params, batch, rng):
            return muvla_loss(params, cfg, batch, rng, remat=self.trainer.gradient_checkpointing)

        return cfg, params, loss_fn

    def make_generate_fn(self, cfg, params, max_new_tokens: int = 32,
                         eos_token_id: int = 0, temperature: float = 0.0):
        """AR decode over fused map+obs tokens (muvla_arch.py:609-682)."""
        from dexbotic_tpu.models.muvla import muvla_generate

        @jax.jit
        def _gen(params, ids, valid, map_img, obs_imgs, rng):
            return muvla_generate(
                params, cfg, ids, valid, map_img, obs_imgs,
                max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
                temperature=temperature, rng=rng,
            )

        return lambda ids, valid, map_img, obs_imgs, rng: _gen(
            params, ids, valid, map_img, obs_imgs, rng
        )

    def inference(self):
        """Serve MUVLA text actions over /process_frame (map view first)."""
        from dexbotic_tpu.exp.serve import MUVLAServer

        tokenizer = self.tokenizer.build_tokenizer()
        cfg, params, _ = self.build_model(tokenizer)
        params = self.prepare_inference_params(params)
        server = MUVLAServer(self, cfg, params, tokenizer)
        server.run()


if __name__ == "__main__":
    MUVLAExp.main()
