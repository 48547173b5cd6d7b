"""Optimizer construction: AdamW + cosine schedule + per-module LR groups.

Mirrors the reference's OptimizerConfig semantics
(/root/reference/dexbotic/exp/base_exp.py:64-203 and exp/trainer.py:25-36):
distinct learning rates for mm_projector / mm_vision / action_head parameter
groups, global grad-norm clipping 1.0, warmup + cosine decay.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None
    mm_vision_lr: Optional[float] = None
    action_head_lr: Optional[float] = None
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"  # 'cosine' | 'constant' | 'linear'
    # first-class freeze (reference ModelConfig.freeze_*, base_exp.py:268-331):
    # frozen subtrees get set_to_zero, which allocates NO optimizer moments
    freeze_llm: bool = False  # decoder stack (lm_head stays trainable)
    freeze_mm_projector: bool = False
    freeze_mm_vision: bool = False


def _group_of(path: tuple) -> str:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if "projector" in keys or "mm_projector" in keys:
        return "mm_projector"
    if "vit" in keys or "mm_vision" in keys:
        return "mm_vision"
    if "action_head" in keys or "action_expert" in keys:
        return "action_head"
    return "base"


def param_group_labels(params):
    return jax.tree_util.tree_map_with_path(lambda p, x: _group_of(p), params)


def make_schedule(cfg: OptimizerConfig, base_lr: float, total_steps: int):
    warmup = max(1, int(cfg.warmup_ratio * total_steps))
    if cfg.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, max(total_steps, warmup + 1), end_value=0.0
        )
    if cfg.lr_scheduler_type == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, warmup),
                optax.linear_schedule(base_lr, 0.0, max(1, total_steps - warmup)),
            ],
            [warmup],
        )
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup), optax.constant_schedule(base_lr)],
        [warmup],
    )


def _is_frozen(path: tuple, cfg: OptimizerConfig) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if cfg.freeze_llm and "llm" in keys and "lm_head" not in keys:
        # reference freeze_llm freezes model.backbone; lm_head lives outside
        return True
    if cfg.freeze_mm_projector and ("projector" in keys or "mm_projector" in keys):
        return True
    if cfg.freeze_mm_vision and ("vit" in keys or "mm_vision" in keys):
        return True
    return False


def build_optimizer(cfg: OptimizerConfig, params, total_steps: int):
    """optax GradientTransformation with per-group LRs.  Frozen subtrees
    (freeze_* flags or group lr=0) map to set_to_zero — no updates AND no
    moment state allocated for them (unlike plain lr=0 scheduling)."""
    group_lrs = {
        "base": cfg.learning_rate,
        "mm_projector": cfg.mm_projector_lr or cfg.learning_rate,
        "mm_vision": cfg.mm_vision_lr if cfg.mm_vision_lr is not None else cfg.learning_rate,
        "action_head": cfg.action_head_lr or cfg.learning_rate,
    }

    def make_group(lr):
        if lr == 0.0:
            return optax.set_to_zero()
        return optax.chain(
            optax.adamw(
                learning_rate=make_schedule(cfg, lr, total_steps),
                b1=cfg.adam_beta1,
                b2=cfg.adam_beta2,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
            ),
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda p, x: "frozen" if _is_frozen(p, cfg) else _group_of(p), params
    )
    transforms = {g: make_group(lr) for g, lr in group_lrs.items()}
    transforms["frozen"] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, labels)
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    return tx


def stopgrad_subtrees(params, names: tuple):
    """stop_gradient every leaf whose path contains one of `names`.

    A frozen vision tower sits BELOW everything trainable (projector/LLM
    consume its output), so masking its optimizer update (set_to_zero) still
    leaves XLA stashing its full backward activations — at a 27-layer SigLIP
    over video frames that is GBs of fp32 attention probabilities (measured:
    the packed-NaVILA frozen step OOMed at 26.7 G).  stop_gradient removes
    the tower's backward graph entirely; only its forward output (which the
    trainable projector needs) survives."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.lax.stop_gradient(x)
        if any(getattr(k, "key", getattr(k, "name", None)) in names for k in p)
        else x,
        params,
    )
