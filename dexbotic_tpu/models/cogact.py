"""CogACT policy: LLaVA-style VLM -> cognition feature -> DiT diffusion head.

Behavior pinned to /root/reference/dexbotic/model/cogact/cogact_arch.py:
  * cognition feature = last-unmasked hidden state of the LLM (:110-120)
  * train: 4x-repeated diffusion MSE in fp32 (:124-135)
  * inference: DDIM-10 with classifier-free guidance scale 1.5 via the
    learned uncondition embedding (:149-198)
TPU-native: the whole frame->chunk path (ViT encode + LLM prefill + DDIM
scan) is one jittable function.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.models import dit as dit_mod
from dexbotic_tpu.models.losses import causal_lm_loss
from dexbotic_tpu.models.vlm import VLMConfig, gather_last_hidden, init_vlm, vlm_forward
from dexbotic_tpu.nn.transformer import lm_logits
from dexbotic_tpu.ops.diffusion import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class CogActConfig:
    vlm: VLMConfig
    action_model_type: str = "DiT-B"
    action_dim: int = 7
    chunk_size: int = 16
    diffusion_steps: int = 100
    repeated_diffusion_steps: int = 4
    cfg_scale: float = 1.5
    ddim_steps: int = 10
    # 'ddim' (reference parity) | 'dpm' (DPM-Solver++(2M): 2nd-order, same
    # trained eps model; ~half the steps for DDIM-10's trajectory error —
    # set ddim_steps=5 with it to halve the serial B=1 sampler chain)
    sampler: str = "ddim"
    sampler_unroll: int = 1  # DDIM scan unroll (see DiTConfig.scan_unroll)
    dit_scan_unroll: int = 1  # DiT block-stack scan unroll
    # Run the whole sampling loop as ONE Pallas launch (ops/dit_fused.py):
    # weights streamed per (step, layer) grid cell, int8 dequant in-register.
    # B=1 latency lever; numerics match the XLA sampler (tested).  Default ON:
    # dispatch only engages on TPU backends for small batch (rows<=4) and
    # falls back to the XLA sampler everywhere else (CPU tests, big B,
    # MemVLA mem_cross_attn).
    fused_sampler: bool = True

    @property
    def dit(self) -> dit_mod.DiTConfig:
        return dit_mod.make_dit_config(
            self.action_model_type,
            token_size=self.vlm.llm.hidden_size,
            action_dim=self.action_dim,
            chunk_size=self.chunk_size,
            scan_unroll=self.dit_scan_unroll,
        )


def init_cogact(key, cfg: CogActConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "vlm": init_vlm(k1, cfg.vlm, dtype),
        "action_head": dit_mod.init_dit(k2, cfg.dit, jnp.float32),  # head stays fp32
    }


def _schedule(cfg: CogActConfig) -> DiffusionSchedule:
    return DiffusionSchedule.create(cfg.diffusion_steps)


def cognition_feature(params, cfg: CogActConfig, input_ids, valid, images, remat=False):
    hidden, _ = vlm_forward(
        params["vlm"], cfg.vlm, input_ids, valid, images=images, remat=remat
    )
    return gather_last_hidden(hidden, valid), hidden


def cogact_loss(
    params,
    cfg: CogActConfig,
    batch: dict,
    rng: jax.Array,
    remat: bool = False,
    with_text_loss: bool = False,
    diffusion_t: Optional[jnp.ndarray] = None,  # [B*rep] injectable (parity)
    diffusion_noise: Optional[jnp.ndarray] = None,  # [B*rep, chunk, dim]
) -> tuple[jnp.ndarray, dict]:
    """Training loss.  batch: input_ids, attention_mask, images, actions
    [B, >=chunk, action_dim] (+labels / has_text / has_action for hybrid
    co-training, hybrid_cogact_arch.py:126-198)."""
    cog, hidden = cognition_feature(
        params, cfg, batch["input_ids"], batch["attention_mask"], batch["images"],
        remat=remat,
    )
    actions = batch["actions"].reshape(cog.shape[0], -1, cfg.action_dim)
    actions = actions[:, : cfg.chunk_size].astype(jnp.float32)

    rep = cfg.repeated_diffusion_steps
    actions_rep = jnp.tile(actions, (rep, 1, 1))
    cog_rep = jnp.tile(cog[:, None, :], (rep, 1, 1)).astype(jnp.float32)

    k_drop, k_diff = jax.random.split(rng)
    sched = _schedule(cfg)

    def eps_fn(x_t, t):
        return dit_mod.dit_forward(
            params["action_head"], cfg.dit, x_t, t, cog_rep,
            drop_rng=None if diffusion_noise is not None else k_drop,
        )

    has_action = batch.get("has_action") if with_text_loss else None
    if has_action is not None:
        # reference hybrid gating (hybrid_cogact_arch.py:164-181): per-sample
        # MSE, weighted-mean over has_action rows with a +1e-6 denominator
        per_sample = sched.training_loss(
            eps_fn, actions_rep, k_diff, t=diffusion_t, noise=diffusion_noise,
            reduction="none",
        )
        ha = jnp.tile(has_action.reshape(-1).astype(jnp.float32), rep)
        action_loss = jnp.sum(per_sample * ha) / (jnp.sum(ha) + 1e-6)
    else:
        action_loss = sched.training_loss(
            eps_fn, actions_rep, k_diff, t=diffusion_t, noise=diffusion_noise
        )
    metrics = {"action_loss": action_loss}
    loss = action_loss

    if with_text_loss:
        logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hidden)
        has_text = batch.get("has_text")
        labels = batch["labels"]
        if has_text is not None:
            # reference (hybrid_cogact_arch.py:131-142): `if ~has_text.any()`
            # is `~(any())` — so whenever ANY row has text, NO row masking
            # happens: the CE runs over every row's labels (the dataloader
            # gives action-only rows all-IGNORE labels) and the whole term
            # is scaled by has_text.any()
            ht = has_text.reshape(-1).astype(bool)
            text_loss = causal_lm_loss(logits, labels) * jnp.any(ht).astype(
                jnp.float32)
        else:
            text_loss = causal_lm_loss(logits, labels)
        metrics["text_loss"] = text_loss
        loss = loss + text_loss
    metrics["loss"] = loss
    return loss, metrics


def cogact_inference_action(
    params,
    cfg: CogActConfig,
    input_ids: jnp.ndarray,
    valid: jnp.ndarray,
    images: jnp.ndarray,
    rng: jax.Array,
    cfg_scale: Optional[float] = None,
    ddim_steps: Optional[int] = None,
    noise: Optional[jnp.ndarray] = None,  # injectable initial noise (parity/replay)
) -> jnp.ndarray:
    """Frame -> normalized action chunk [B, chunk, action_dim]; one jit unit."""
    cfg_scale = cfg.cfg_scale if cfg_scale is None else cfg_scale
    ddim_steps = cfg.ddim_steps if ddim_steps is None else ddim_steps

    cog, _ = cognition_feature(params, cfg, input_ids, valid, images)
    B = cog.shape[0]
    if noise is None:
        noise = jax.random.normal(rng, (B, cfg.chunk_size, cfg.action_dim), jnp.float32)
    sched = _schedule(cfg)
    head = params["action_head"]

    if (
        cfg.fused_sampler
        and B * (2 if cfg_scale > 1.0 else 1) <= 4
        and jax.default_backend() == "tpu"
    ):
        from dexbotic_tpu.ops.dit_fused import fused_dit_sample

        return fused_dit_sample(
            head, cfg.dit, cog[:, None, :].astype(jnp.float32), noise, sched,
            steps=ddim_steps, cfg_scale=cfg_scale, sampler=cfg.sampler,
        )

    def sample(eps_fn, x0):
        if cfg.sampler == "dpm":
            return sched.dpm_solver_pp_2m(
                eps_fn, x0, ddim_steps, unroll=cfg.sampler_unroll
            )
        return sched.ddim_sample(eps_fn, x0, ddim_steps, unroll=cfg.sampler_unroll)

    if cfg_scale > 1.0:
        uncond = jnp.broadcast_to(head["uncondition"][None, None, :], (B, 1, cog.shape[-1]))
        z = jnp.concatenate([cog[:, None, :].astype(jnp.float32), uncond.astype(jnp.float32)], axis=0)
        noise2 = jnp.concatenate([noise, noise], axis=0)

        def eps_fn(x, t):
            return dit_mod.dit_forward_with_cfg(head, cfg.dit, x, t, z, cfg_scale)

        samples = sample(eps_fn, noise2)[:B]
    else:
        z = cog[:, None, :].astype(jnp.float32)

        def eps_fn(x, t):
            return dit_mod.dit_forward(head, cfg.dit, x, t, z)

        samples = sample(eps_fn, noise)
    return samples


def denorm_actions(actions: jnp.ndarray, low, high) -> jnp.ndarray:
    """[-1, 1]-normalized -> robot units (dexbotic_arch.py:552-563)."""
    actions = jnp.clip(actions, -1.0, 1.0)
    low = jnp.asarray(low)[None, :]
    high = jnp.asarray(high)[None, :]
    return low + (actions + 1.0) * 0.5 * (high - low)
