"""pi0 / pi0.5 / DM0 experiments (flow-matching family).

Defaults pinned to /root/reference/dexbotic/exp/{pi0_exp,pi05_exp,dm0_exp}.py:
48-token fixed text prompts, 3 camera views with zero padding + image masks,
action pipeline Pad->Traj(50, no-flatten)->Delta->ActionNorm (pi0_exp.py:
226-243), state input, serving with input/output transform pipelines.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.data import transforms as T
from dexbotic_tpu.data.multimodal import LoadMultiModal
from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.trainer import load_checkpoint_params
from dexbotic_tpu.models import presets
from dexbotic_tpu.models.flow_vla import (
    FlowVLAConfig,
    dm0_config,
    flow_vla_inference_action,
    flow_vla_loss,
    init_flow_vla,
    pi0_config,
    pi05_config,
)


@dataclass
class FlowModelConfig(base_exp.Config):
    model_name_or_path: Optional[str] = None
    variant: str = "pi0"  # 'pi0' | 'pi05' | 'dm0'
    llm_preset: str = "gemma_2b"
    expert_preset: str = "gemma_300m"
    vit_preset: str = "siglip_so400m_224"
    projector_type: str = "linear"
    action_dim: int = 32
    chunk_size: int = 50
    num_flow_steps: int = 10
    seed: int = 0

    def build_config(self) -> FlowVLAConfig:
        llm = presets.LLM_PRESETS[self.llm_preset]
        expert = presets.EXPERT_PRESETS[self.expert_preset]
        vit = presets.VIT_PRESETS[self.vit_preset]
        kw = dict(
            projector_type=self.projector_type, action_dim=self.action_dim,
            chunk_size=self.chunk_size, num_flow_steps=self.num_flow_steps,
        )
        if self.variant == "pi0":
            return pi0_config(llm, expert, vit, **kw)
        if self.variant == "pi05":
            return pi05_config(llm, expert, vit, **kw)
        if self.variant == "dm0":
            return dm0_config(llm, expert, vit, **kw)
        raise ValueError(self.variant)

    def build_params(self, cfg: FlowVLAConfig):
        if self.model_name_or_path:
            return load_checkpoint_params(self.model_name_or_path)
        return init_flow_vla(jax.random.PRNGKey(self.seed), cfg)


@dataclass
class Pi0ActionConfig(base_exp.ActionConfig):
    """pi0 action pipeline, reference order (pi0_exp.py:225-242): pad
    state/action to 32-D FIRST, 50-step unflattened 'last'-padded trajectory,
    THEN delta (every chunk step relative to the WINDOW-START state), then
    normalize action AND state — mean/std for pi0 (``use_quantiles=False``),
    quantile for pi0.5/DM0 (pi05_exp.py:72-89, dm0_exp.py:244-264)."""

    trajectory_length: int = 50
    action_ndim: int = 32
    use_quantiles: bool = False

    def _stats_mapping(self, stats: dict) -> dict:
        # pi0-format norm files carry {'action': ..., 'state': ...}; accept
        # the CogACT-format {'default': ...} by aliasing it to 'action'
        if "action" not in stats and "default" in stats:
            return {"action": stats["default"], "default": stats["default"]}
        return stats

    def build_action_process_func(self) -> T.Pipeline:
        stats = self._read_norm_stats(self.statistic_mapping)
        pipe = T.Pipeline(
            [
                T.ToDict(),
                T.ToNumpy(),
                T.AddAction(predict_length=1),
                T.PadState(ndim=self.action_ndim),
                T.PadAction(ndim=self.action_ndim),
                T.AddTrajectory(
                    trajectory_length=self.trajectory_length,
                    flatten=False,
                    padding_mode="last",
                    padding_action=self.padding_action,
                ),
                T.DeltaAction(enable=self.delta),
                T.ActionNorm(
                    statistic_mapping=self._stats_mapping(stats),
                    strict=False,
                    use_quantiles=self.use_quantiles,
                ),
                LoadMultiModal(return_masks=self.load_multimodal_masks),
                T.AddPromptTemplate(prompt_template=self.prompt_template),
                T.ReplaceAnswer(default_answer=self.replace_with_default_answer),
                T.ToList(),
            ]
        )
        return pipe


@dataclass
class Pi0InferenceConfig(base_exp.Config):
    """Serving-side transform pipelines (exp/pi0_exp.py:343-514): input
    state padding + output delta->absolute / relative->delta conversion.
    The reference's pi0 server ALWAYS runs AbsoluteAction on the denormed
    chunk (pi0_exp.py:370-376) with non_delta_mask defaulting to the gripper
    dim [6] (pi0_exp.py:321)."""

    absolute_action: bool = True
    relative_to_delta: bool = False
    action_dim_out: int = 7  # env action dims (rest of the 32 are padding)
    non_delta_mask: Optional[list] = field(default_factory=lambda: [6])

    def build_output_transforms(self, meta_data: dict):
        meta = {"non_delta_mask": self.non_delta_mask, "periodic_mask": None,
                "periodic_range": None, **meta_data}
        out = []
        if self.relative_to_delta:
            out.append(T.Relative2Delta())
        if self.absolute_action:
            out.append(T.AbsoluteAction())
        return T.Pipeline(out), meta


@dataclass
class Pi0Exp(base_exp.BaseExp):
    exp_name: str = "pi0"
    model: FlowModelConfig = field(default_factory=FlowModelConfig)
    inference_cfg: Pi0InferenceConfig = field(default_factory=Pi0InferenceConfig)
    action: Pi0ActionConfig = field(
        default_factory=lambda: Pi0ActionConfig(
            load_multimodal_masks=True, prompt_template="{prompt}"
        )
    )
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            num_images=3,
            image_pad_mode="zero",
            image_aspect_ratio=None,
            data_keys=["input_ids", "labels", "action", "image", "state", "image_masks"],
        )
    )
    tokenizer: base_exp.TokenizerConfig = field(
        default_factory=lambda: base_exp.TokenizerConfig(model_max_length=48)
    )

    def build_tokenization(self, tokenizer):
        from dexbotic_tpu.tokenization.tokenize import Pi0Tokenization

        return Pi0Tokenization(tokenizer, max_len=self.tokenizer.model_max_length)

    def build_model(self, tokenizer):
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)

        def loss_fn(params, batch, rng):
            batch = dict(batch)
            batch["states"] = batch.pop("states", None)
            return flow_vla_loss(
                params, cfg, batch, rng, remat=self.trainer.gradient_checkpointing
            )

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
                # the FULL stats mapping ({'action':..,'state':..} for pi0
                # files, or CogACT-format {'default':..}) — the server's
                # ServingStats normalizes state in and denorms action out
                # (ref pi0_exp.py:343-351 read_normalization_stats)
                norms = json.load(open(p))["norm_stats"]
        return cfg, params, norms

    def make_infer_fn(self, cfg, params):
        @jax.jit
        def _infer(params, input_ids, text_mask, images, image_masks, states, rng):
            return flow_vla_inference_action(
                params, cfg, input_ids, text_mask, images, image_masks, states, rng
            )

        return lambda *a: _infer(params, *a)

    def inference(self):
        from dexbotic_tpu.exp.serve import FlowVLAServer

        cfg, params, norms = self.load_for_inference()
        tokenizer = self.tokenizer.build_tokenizer()
        FlowVLAServer(self, cfg, params, tokenizer, norms,
                      micro_batch=self.serve_micro_batch).run()

    def inference_single(self, images=None, prompt: str = "pick up the object",
                          states=None):
        import numpy as np

        from dexbotic_tpu.data.image_processing import preprocess_image

        cfg, params, norms = self.load_for_inference()
        tokenizer = self.tokenizer.build_tokenizer()
        tok = self.build_tokenization(tokenizer)
        out = tok(conversations=[{"from": "human", "value": prompt}])
        ids = jnp.asarray(out["input_ids"], jnp.int32)[None]
        text_mask = (ids != 0).astype(jnp.int32)

        proc = self.data.build_image_processor()
        n = self.data.num_images
        if images is None:
            images = [np.zeros((proc.size, proc.size, 3), np.uint8)]
        imgs = np.zeros((1, n, proc.size, proc.size, 3), np.float32)
        masks = np.zeros((1, n), np.int32)
        for i, im in enumerate(images[:n]):
            imgs[0, i] = preprocess_image(np.asarray(im), proc)
            masks[0, i] = 1
        s = np.zeros((1, cfg.action_dim), np.float32)
        if states is not None:
            vals = np.asarray(states, np.float32).ravel()
            s[0, : len(vals)] = vals

        from dexbotic_tpu.exp.serve import ServingStats

        mapping = norms
        if norms is not None and not isinstance(norms.get("action"), dict):
            mapping = {"action": norms.get("default", norms)}
        stats = ServingStats(mapping, self.action.use_quantiles)

        infer = self.make_infer_fn(cfg, params)
        actions = np.asarray(jax.device_get(infer(
            ids, text_mask, jnp.asarray(imgs), jnp.asarray(masks),
            jnp.asarray(stats.normalize("state", s)),
            jax.random.PRNGKey(0),
        )))[0]
        actions = stats.denormalize("action", np.asarray(actions, np.float64))
        print(actions.tolist())
        return actions


@dataclass
class Pi05Exp(Pi0Exp):
    exp_name: str = "pi05"
    model: FlowModelConfig = field(
        default_factory=lambda: FlowModelConfig(
            variant="pi05", expert_preset="gemma_300m_adarms"
        )
    )
    # pi0.5 normalizes with q01/q99 quantiles, not mean/std
    # (ref pi05_exp.py:83 training, :123/:132 serving)
    action: Pi0ActionConfig = field(
        default_factory=lambda: Pi0ActionConfig(
            load_multimodal_masks=True, prompt_template="{prompt}",
            use_quantiles=True,
        )
    )


@dataclass
class DM0Exp(Pi0Exp):
    exp_name: str = "dm0"
    model: FlowModelConfig = field(
        default_factory=lambda: FlowModelConfig(
            variant="dm0", llm_preset="qwen3_1.7b", expert_preset="qwen3_0.6b",
            vit_preset="siglip_so400m_224",
        )
    )
    tokenizer: base_exp.TokenizerConfig = field(
        default_factory=lambda: base_exp.TokenizerConfig(
            model_max_length=100, chat_template="step"
        )
    )
    # DM0 is quantile-normalized like pi0.5 (ref dm0_exp.py:258,:351-360)
    action: Pi0ActionConfig = field(
        default_factory=lambda: Pi0ActionConfig(
            load_multimodal_masks=True, prompt_template="{prompt}",
            use_quantiles=True,
        )
    )

    def build_tokenization(self, tokenizer):
        from dexbotic_tpu.tokenization.tokenize import DM0Tokenization

        return DM0Tokenization(tokenizer, max_len=self.tokenizer.model_max_length)


if __name__ == "__main__":
    Pi0Exp.main()
