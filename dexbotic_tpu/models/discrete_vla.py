"""Discrete VLA (OpenVLA-style): plain AR generation + integer parsing.

Behavior pinned to /root/reference/dexbotic/model/discrete_vla/
discrete_vla_arch.py: generate text, regex-parse `action_dim` integers,
map bins -> [-1, 1] -> denorm; retry with a different sampling seed on parse
failure (up to 40x, host-side).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.models.generate import generate
from dexbotic_tpu.models.losses import causal_lm_loss
from dexbotic_tpu.models.vlm import VLMConfig, vlm_forward
from dexbotic_tpu.nn.transformer import lm_logits


@dataclasses.dataclass(frozen=True)
class DiscreteVLAConfig:
    vlm: VLMConfig
    action_dim: int = 7
    vocab_bins: int = 255
    max_new_tokens: int = 32
    max_retries: int = 40


def init_discrete_vla(key, cfg: DiscreteVLAConfig, dtype=jnp.float32):
    from dexbotic_tpu.models.vlm import init_vlm

    return {"vlm": init_vlm(key, cfg.vlm, dtype)}


def discrete_vla_loss(params, cfg: DiscreteVLAConfig, batch: dict, rng=None, remat=False):
    """Standard next-token CE on the tokenized action-string answer."""
    hidden, _ = vlm_forward(
        params["vlm"], cfg.vlm, batch["input_ids"], batch["attention_mask"],
        images=batch["images"], remat=remat,
    )
    logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hidden)
    loss = causal_lm_loss(logits, batch["labels"])
    return loss, {"text_loss": loss, "loss": loss}


def parse_action_text(text: str, action_dim: int, vocab_bins: int) -> Optional[np.ndarray]:
    """Extract `action_dim` integers; bins -> [-1, 1] (:15-58)."""
    nums = re.findall(r"\d+", text)
    if len(nums) < action_dim:
        return None
    bins = np.array([int(n) for n in nums[:action_dim]], dtype=np.float64)
    bins = np.clip(bins, 0, vocab_bins - 1)
    return bins / (vocab_bins - 1) * 2.0 - 1.0


def discrete_vla_inference_action(
    params,
    cfg: DiscreteVLAConfig,
    tokenizer,
    input_ids: jnp.ndarray,
    valid: jnp.ndarray,
    images: jnp.ndarray,
    eos_token_id: int,
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Greedy decode, then sampled retries on parse failure (host loop)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    gen = jax.jit(
        lambda params, ids, valid, images, r, temp: generate(
            params["vlm"], cfg.vlm, ids, valid, images,
            max_new_tokens=cfg.max_new_tokens, eos_token_id=eos_token_id,
            temperature=temp, rng=r,
        )[0],
        static_argnums=(5,),
    )
    tokens = jax.device_get(gen(params, input_ids, valid, images, rng, 0.0))
    text = tokenizer.decode([t for t in tokens[0] if t >= 0])
    action = parse_action_text(text, cfg.action_dim, cfg.vocab_bins)
    tries = 0
    while action is None and tries < cfg.max_retries:
        rng, r = jax.random.split(rng)
        tokens = jax.device_get(gen(params, input_ids, valid, images, r, 1.0))
        text = tokenizer.decode([t for t in tokens[0] if t >= 0])
        action = parse_action_text(text, cfg.action_dim, cfg.vocab_bins)
        tries += 1
    if action is None:
        action = np.zeros((cfg.action_dim,))
    return action
