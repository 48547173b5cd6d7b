"""VLM core: vision tower + projector + LLM with static-shape image splicing.

The reference splices projected image features into ragged per-row token
streams and repads (/root/reference/dexbotic/model/dexbotic_arch.py:182-373).
TPU-native formulation: the tokenizer expands each ``<image>`` tag to exactly
``num_image_tokens`` IMAGE_TOKEN_INDEX placeholders, so sequence length is
static and the splice is a vectorized select/gather — numerically identical
to the reference's insert-then-pad on right-padded batches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.nn.projector import apply_projector, init_projector
from dexbotic_tpu.nn.transformer import (
    Stream,
    TransformerConfig,
    embed_tokens,
    init_transformer,
    mot_forward,
)
from dexbotic_tpu.nn.vit import ViTConfig, init_vit, vit_forward


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    llm: TransformerConfig
    vit: ViTConfig
    projector_type: str = "mlp2x_gelu"

    @property
    def num_image_tokens(self) -> int:
        n = self.vit.num_output_tokens
        if self.projector_type == "mlp_downsample":
            g = int(round(n**0.5))
            n = ((g + 1) // 2) ** 2
        return n


def init_vlm(key, cfg: VLMConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "llm": init_transformer(k1, cfg.llm, dtype),
        "vit": init_vit(k2, cfg.vit, dtype),
        "projector": init_projector(
            k3, cfg.projector_type, cfg.vit.hidden_size, cfg.llm.hidden_size, dtype
        ),
    }


def encode_images(params, cfg: VLMConfig, images: jnp.ndarray,
                  remat: bool = False) -> jnp.ndarray:
    """[B, n, H, W, 3] or [B, H, W, 3] -> [B, n*T, llm_hidden]."""
    squeeze = images.ndim == 4
    if squeeze:
        images = images[:, None]
    B, n = images.shape[:2]
    flat = images.reshape((B * n,) + images.shape[2:])
    feats = vit_forward(params["vit"], cfg.vit, flat, remat=remat)
    feats = apply_projector(params["projector"], feats, cfg.projector_type)
    return feats.reshape(B, -1, feats.shape[-1])


def splice_image_embeds(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,  # int[B, S], IMAGE_TOKEN_INDEX at image slots
    image_features: jnp.ndarray,  # [B, NT, H]
) -> jnp.ndarray:
    """Replace placeholder ids with image features, in order, per row."""
    is_img = input_ids == IMAGE_TOKEN_INDEX
    safe_ids = jnp.where(is_img, 0, input_ids)
    text = embed_tokens(params["llm"], cfg.llm, safe_ids)
    idx = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, image_features.shape[1] - 1)
    gathered = jnp.take_along_axis(
        image_features.astype(text.dtype), idx[..., None], axis=1
    )
    return jnp.where(is_img[..., None], gathered, text)


def vlm_forward(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,
    valid: jnp.ndarray,  # attention mask int[B, S]
    images: Optional[jnp.ndarray] = None,
    cache: Optional[dict] = None,
    update_cache: bool = False,
    inputs_embeds: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    grp: Optional[jnp.ndarray] = None,
    remat: bool = False,
    write_cols: Optional[jnp.ndarray] = None,  # int[B] per-row cache columns
):
    """Causal VLM forward.  Returns (last_hidden post-norm, cache)."""
    if cfg.llm.moe_num_experts:
        # This path discards the MoE load-balance aux loss; training a MoE
        # router through it risks expert collapse.  Use transformer_forward /
        # mot_forward(want_aux=True) and add the aux term to the loss.
        import warnings

        warnings.warn(
            "vlm_forward drops the MoE load-balance aux loss "
            "(moe_num_experts is set); use want_aux paths for training",
            stacklevel=2,
        )
    if inputs_embeds is None:
        if images is not None:
            feats = encode_images(params, cfg, images, remat=remat)
            inputs_embeds = splice_image_embeds(params, cfg, input_ids, feats)
        else:
            inputs_embeds = embed_tokens(params["llm"], cfg.llm, input_ids)
    valid = valid.astype(jnp.int32)
    if grp is None:
        grp = jnp.cumsum(valid, axis=1)
        if cache is not None:
            # continue causal numbering after cached tokens
            grp = grp + jnp.sum(cache["valid"], axis=1, keepdims=True)
    if positions is None:
        positions = jnp.cumsum(valid, axis=1) - 1
        if cache is not None:
            positions = positions + jnp.sum(cache["valid"], axis=1, keepdims=True)

    outs, cache = mot_forward(
        [Stream(cfg.llm, params["llm"], inputs_embeds)],
        positions=positions,
        q_grp=grp,
        q_valid=valid,
        cache=cache,
        update_cache=update_cache,
        remat=remat,
        write_cols=write_cols,
    )
    return outs[0], cache


def last_valid_index(valid: jnp.ndarray) -> jnp.ndarray:
    """Index of the last non-padding token per row (right- or left-padded).

    Matches the reference's cumsum-argmax trick
    (/root/reference/dexbotic/model/cogact/cogact_arch.py:110-120).
    """
    cs = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    return jnp.argmax(cs == cs[:, -1:], axis=1).astype(jnp.int32)


def gather_last_hidden(hidden: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[B, S, H], [B, S] -> [B, H] hidden state at the last valid token."""
    idx = last_valid_index(valid)
    return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
