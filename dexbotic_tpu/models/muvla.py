"""MUVLA: map-understanding VLA with dual towers and a reward head.

Behavior pinned to /root/reference/dexbotic/model/muvla/muvla_arch.py:
  * dual vision towers — map view (mm tower) + observation views (obs tower)
  * history frames compressed by SimpleQFormer (192 learned queries, :51-66)
  * CrossFuseReduce: obs tokens cross-attend into map tokens then residual+LN
    (:29-49); fused tokens projected into the LLM
  * reward head on the last hidden state with expectile-0.9 MSE (:578-592)
    and reward-weighted CE: per-sample CE scaled by (1 + sigmoid(reward))
    (:560-576)
  * AR generation supported through the shared generate() path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import IGNORE_INDEX
from dexbotic_tpu.models.vlm import VLMConfig, splice_image_embeds, vlm_forward
from dexbotic_tpu.nn import core
from dexbotic_tpu.nn.projector import apply_projector, init_projector
from dexbotic_tpu.nn.transformer import init_transformer, lm_logits
from dexbotic_tpu.nn.vit import ViTConfig, init_vit, vit_forward
from dexbotic_tpu.ops.attention import attention_xla
from dexbotic_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class MUVLAConfig:
    vlm: VLMConfig  # llm + MAP tower + projector
    obs_vit: ViTConfig
    inter_dim: int = 1024
    num_history_queries: int = 192
    fuse_heads: Optional[int] = None  # default inter_dim // 64
    expectile: float = 0.9

    @property
    def heads(self) -> int:
        return self.fuse_heads or self.inter_dim // 64

    def num_fused_tokens(self, n_views: int) -> int:
        """Fused map+obs token count the prompt must hold placeholders for:
        history queries (when history views exist) + current-view tokens."""
        n = self.obs_vit.num_output_tokens
        if n_views > 1:
            n += self.num_history_queries
        return n


def _mha_init(key, dim, heads, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "q": core.linear_init(ks[0], dim, dim, True, dtype),
        "k": core.linear_init(ks[1], dim, dim, True, dtype),
        "v": core.linear_init(ks[2], dim, dim, True, dtype),
        "o": core.linear_init(ks[3], dim, dim, True, dtype),
    }


def _mha(p, query, kv, heads):
    B, N, D = query.shape
    M = kv.shape[1]
    hd = D // heads
    q = core.linear(p["q"], query).reshape(B, N, heads, hd)
    k = core.linear(p["k"], kv).reshape(B, M, heads, hd)
    v = core.linear(p["v"], kv).reshape(B, M, heads, hd)
    a = attention_xla(
        q, k, v, jnp.zeros((B, N), jnp.int32), jnp.zeros((B, M), jnp.int32),
        jnp.ones((B, M), jnp.int32),
    ).reshape(B, N, D)
    return core.linear(p["o"], a)


def init_muvla(key, cfg: MUVLAConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    d = cfg.inter_dim
    return {
        "llm": init_transformer(ks[0], cfg.vlm.llm, dtype),
        "vit": init_vit(ks[1], cfg.vlm.vit, dtype),  # map tower
        "obs_vit": init_vit(ks[2], cfg.obs_vit, dtype),
        "projector": init_projector(
            ks[3], cfg.vlm.projector_type, cfg.vlm.vit.hidden_size, cfg.vlm.llm.hidden_size, dtype
        ),
        "fuser": {
            "attn": _mha_init(ks[4], d, cfg.heads, dtype),
            "ln": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
        },
        "qformer": {
            "queries": core.normal_init(1.0)(ks[5], (cfg.num_history_queries, d), dtype),
            "input_proj": core.linear_init(ks[6], cfg.obs_vit.hidden_size, d, True, dtype),
            "attn": _mha_init(jax.random.split(ks[7])[0], d, 8, dtype),
            "ln": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
        },
        "reward_head": core.linear_init(
            jax.random.split(ks[7])[1], cfg.vlm.llm.hidden_size, 1, False, dtype
        ),
    }


def fuse_obs_with_history(params, cfg: MUVLAConfig, map_img, obs_imgs):
    """map_img [B, H, W, 3]; obs_imgs [B, N_views, H, W, 3] (view 0 = current,
    rest = history).  Returns projected LLM tokens (muvla_arch.py:224-248)."""
    B, N = obs_imgs.shape[:2]
    obs_current = obs_imgs[:, 0]
    cur_feat = vit_forward(params["obs_vit"], cfg.obs_vit, obs_current)
    if N > 1:
        hist = obs_imgs[:, 1:].reshape((B * (N - 1),) + obs_imgs.shape[2:])
        hist_feat = vit_forward(params["obs_vit"], cfg.obs_vit, hist)
        hist_feat = hist_feat.reshape(B, -1, hist_feat.shape[-1])
        q = params["qformer"]
        memory = core.linear(q["input_proj"], hist_feat)
        queries = jnp.broadcast_to(
            q["queries"].astype(memory.dtype)[None], (B, cfg.num_history_queries, cfg.inter_dim)
        )
        hist_tok = _mha(q["attn"], queries, memory, 8)
        hist_tok = layer_norm(hist_tok, q["ln"]["w"], q["ln"]["b"], eps=1e-5)
        obs_tok = jnp.concatenate([hist_tok, cur_feat], axis=1)
    else:
        obs_tok = cur_feat

    map_feat = vit_forward(params["vit"], cfg.vlm.vit, map_img)
    f = params["fuser"]
    fused = _mha(f["attn"], obs_tok, map_feat, cfg.heads)
    fused = layer_norm(fused + obs_tok, f["ln"]["w"], f["ln"]["b"], eps=1e-5)
    return apply_projector(params["projector"], fused, cfg.vlm.projector_type)


def muvla_loss(params, cfg: MUVLAConfig, batch: dict, rng=None, remat: bool = False):
    """Reward-weighted CE + expectile reward regression.

    batch: input_ids (with fused-token placeholders), attention_mask, labels,
    map_images [B,H,W,3], obs_images [B,N,H,W,3], optional reward [B]."""
    tokens = fuse_obs_with_history(params, cfg, batch["map_images"], batch["obs_images"])
    embeds = splice_image_embeds({"llm": params["llm"]}, cfg.vlm, batch["input_ids"], tokens)
    hidden, _ = vlm_forward(
        {"llm": params["llm"], "vit": params["vit"], "projector": params["projector"]},
        cfg.vlm, batch["input_ids"], batch["attention_mask"],
        inputs_embeds=embeds, remat=remat,
    )
    logits = lm_logits(params["llm"], cfg.vlm.llm, hidden).astype(jnp.float32)

    labels = batch["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = (shift_labels != IGNORE_INDEX).astype(jnp.float32)
    safe = jnp.where(shift_labels == IGNORE_INDEX, 0, shift_labels)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    per_sample = jnp.sum(nll * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1.0)

    reward = batch.get("reward")
    metrics = {}
    if reward is not None:
        weights = 1.0 + jax.nn.sigmoid(reward.astype(jnp.float32))
        text_loss = jnp.mean(per_sample * weights)
    else:
        text_loss = jnp.mean(per_sample)
    loss = text_loss
    metrics["text_loss"] = text_loss

    if reward is not None:
        pred = core.linear(params["reward_head"], hidden.astype(jnp.float32))[..., 0]
        last = pred[:, -1]
        diff = last - reward.astype(jnp.float32)
        w = jnp.where(diff < 0, cfg.expectile, 1.0 - cfg.expectile)
        reward_loss = jnp.mean(w * diff**2)
        metrics["reward_loss"] = reward_loss
        loss = loss + 0.5 * reward_loss
    metrics["loss"] = loss
    return loss, metrics


def muvla_generate(
    params,
    cfg: MUVLAConfig,
    input_ids: jnp.ndarray,  # int[B, S]; IMAGE_TOKEN_INDEX at fused slots
    valid: jnp.ndarray,
    map_images: jnp.ndarray,  # [B, H, W, 3]
    obs_images: jnp.ndarray,  # [B, N_views, H, W, 3]
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    temperature: float = 0.0,
    rng=None,
):
    """AR generation over the fused map+obs tokens: fuse -> splice -> shared
    prefill+scan decode (the reference's custom prepare_inputs_for_generation
    with Static/DynamicCache, muvla_arch.py:609-682).  input_ids must carry
    cfg.num_fused_tokens(N_views) placeholders."""
    from dexbotic_tpu.models.generate import generate

    tokens = fuse_obs_with_history(params, cfg, map_images, obs_images)
    embeds = splice_image_embeds({"llm": params["llm"]}, cfg.vlm, input_ids, tokens)
    vlm_params = {
        "llm": params["llm"], "vit": params["vit"], "projector": params["projector"]
    }
    return generate(
        vlm_params, cfg.vlm, input_ids, valid, None,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, temperature=temperature, rng=rng,
        inputs_embeds=embeds,
    )
