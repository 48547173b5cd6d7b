"""Flow-matching VLA family: pi0, pi0.5, DM0 on one MoT engine.

One policy module parameterized by config flags reproduces all three
reference architectures:
  * pi0  (/root/reference/dexbotic/model/pi0/pi0_arch.py): PaliGemma VLM +
    Gemma action expert; bidirectional prefix; suffix = state token +
    chunk_size action tokens fused with sincos time via MLP; flow matching
    t~Beta(1.5,1), x_t = t*noise + (1-t)*a, target u = noise - a; inference =
    prefill prefix into a frozen KV cache then 10 Euler steps re-running
    suffix-only attention (:402-491).
  * pi0.5 (/root/reference/dexbotic/model/pi05/pi05_arch.py): same skeleton;
    NO state token; time conditions the expert via adaptive RMSNorm
    (adarms_cond = silu(mlp_out(silu(mlp_in(sincos)))), :302-332).
  * DM0  (/root/reference/dexbotic/model/dm0/dm0_arch.py): Qwen3 VLM + Qwen3
    expert (qk-norm); CAUSAL prefix (ar=1 per prefix token, :330-353); no
    state token; time fused like pi0.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.models.vlm import VLMConfig, init_vlm
from dexbotic_tpu.nn import core
from dexbotic_tpu.nn.transformer import (
    Stream,
    TransformerConfig,
    embed_tokens,
    init_transformer,
    mot_forward,
)
from dexbotic_tpu.nn.vit import ViTConfig, vit_forward
from dexbotic_tpu.nn.projector import apply_projector


@dataclasses.dataclass(frozen=True)
class FlowVLAConfig:
    llm: TransformerConfig
    expert: TransformerConfig
    vit: ViTConfig
    projector_type: str = "linear"
    action_dim: int = 32
    chunk_size: int = 50
    num_flow_steps: int = 10
    use_state_token: bool = True  # pi0 yes; pi0.5 / DM0 no
    adarms: bool = False  # pi0.5
    time_in_suffix: bool = True  # pi0/DM0 fuse time into action tokens
    causal_prefix: bool = False  # DM0
    progress_token: bool = False  # DM0-Prog (dm0_prog_arch.py:360-576)

    @property
    def vlm(self) -> VLMConfig:
        return VLMConfig(llm=self.llm, vit=self.vit, projector_type=self.projector_type)

    @property
    def suffix_len(self) -> int:
        return self.chunk_size + (1 if self.use_state_token else 0)


def pi0_config(llm, expert, vit, **kw) -> FlowVLAConfig:
    return FlowVLAConfig(llm=llm, expert=expert, vit=vit, use_state_token=True, **kw)


def pi05_config(llm, expert, vit, **kw) -> FlowVLAConfig:
    assert expert.adarms_cond_dim is not None
    return FlowVLAConfig(
        llm=llm, expert=expert, vit=vit,
        use_state_token=False, adarms=True, time_in_suffix=False, **kw
    )


def dm0_config(llm, expert, vit, **kw) -> FlowVLAConfig:
    return FlowVLAConfig(
        llm=llm, expert=expert, vit=vit,
        use_state_token=False, causal_prefix=True, **kw
    )


def dm0_prog_config(llm, expert, vit, **kw) -> FlowVLAConfig:
    return FlowVLAConfig(
        llm=llm, expert=expert, vit=vit,
        use_state_token=False, causal_prefix=True, progress_token=True, **kw
    )


def init_flow_vla(key, cfg: FlowVLAConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    eh = cfg.expert.hidden_size
    params = {
        "vlm": init_vlm(ks[0], cfg.vlm, dtype),
        "expert": init_transformer(ks[1], cfg.expert, dtype),
        "action_in_proj": core.linear_init(ks[2], cfg.action_dim, eh, True, dtype),
        "action_out_proj": core.linear_init(ks[3], eh, cfg.action_dim, True, dtype),
    }
    if cfg.use_state_token:
        params["state_proj"] = core.linear_init(ks[4], cfg.action_dim, eh, True, dtype)
    if cfg.time_in_suffix:
        params["time_mlp_in"] = core.linear_init(ks[5], 2 * eh, eh, True, dtype)
    else:  # pi0.5: sincos(eh) -> eh
        params["time_mlp_in"] = core.linear_init(ks[5], eh, eh, True, dtype)
    params["time_mlp_out"] = core.linear_init(ks[6], eh, eh, True, dtype)
    if cfg.progress_token:
        k7, k8 = jax.random.split(ks[7])
        params["progress_in_proj"] = core.linear_init(k7, 1, eh, True, dtype)
        params["progress_out_proj"] = core.linear_init(k8, eh, 1, True, dtype)
    return params


def posemb_sincos(
    time: jnp.ndarray, dim: int, min_period: float = 4e-3, max_period: float = 4.0
) -> jnp.ndarray:
    """[sin, cos] embedding of scalar times (dm0_utils.py:95-127; fp64 period
    table computed host-side)."""
    fraction = np.linspace(0.0, 1.0, dim // 2)
    period = min_period * (max_period / min_period) ** fraction
    scale = jnp.asarray(1.0 / period * 2 * np.pi, jnp.float32)
    arg = scale[None, :] * time.astype(jnp.float32)[:, None]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


# ---------------------------------------------------------------------------
# Prefix / suffix embedding
# ---------------------------------------------------------------------------


def embed_prefix(
    params,
    cfg: FlowVLAConfig,
    images: jnp.ndarray,  # [B, n_views, H, W, 3]
    image_masks: jnp.ndarray,  # bool[B, n_views]
    input_ids: jnp.ndarray,  # int[B, T_text] (fixed 48 for pi0)
    text_mask: jnp.ndarray,  # bool[B, T_text]
):
    """Returns (tokens [B,P,llm_hidden], input_mask [B,P], ar [B,P])."""
    B, n = images.shape[:2]
    flat = images.reshape((B * n,) + images.shape[2:])
    feats = vit_forward(params["vlm"]["vit"], cfg.vit, flat)
    feats = apply_projector(params["vlm"]["projector"], feats, cfg.projector_type)
    T_img = feats.shape[1]
    feats = feats.reshape(B, n * T_img, -1)
    img_mask = jnp.repeat(image_masks.astype(jnp.int32), T_img, axis=1)

    text = embed_tokens(params["vlm"]["llm"], cfg.llm, input_ids, dtype=feats.dtype)
    tokens = jnp.concatenate([feats, text], axis=1)
    input_mask = jnp.concatenate([img_mask, text_mask.astype(jnp.int32)], axis=1)
    ar_bit = 1 if cfg.causal_prefix else 0
    ar = jnp.full(input_mask.shape, ar_bit, jnp.int32)
    return tokens, input_mask, ar


def embed_suffix(
    params,
    cfg: FlowVLAConfig,
    states: Optional[jnp.ndarray],  # [B, action_dim]
    x_t: jnp.ndarray,  # [B, chunk, action_dim]
    time: jnp.ndarray,  # [B]
    dtype=None,
    progress: Optional[jnp.ndarray] = None,  # [B, 1, 1] DM0-Prog
):
    """Returns (tokens [B,S,expert_hidden], mask, ar, adarms_cond|None)."""
    B = x_t.shape[0]
    eh = cfg.expert.hidden_size
    dtype = dtype or x_t.dtype
    parts, ar = [], []

    if cfg.use_state_token:
        st = core.linear(params["state_proj"], states.astype(dtype))[:, None, :]
        parts.append(st)
        ar.append(1)

    time_emb = posemb_sincos(time, eh).astype(dtype)
    action_tok = core.linear(params["action_in_proj"], x_t.astype(dtype))
    n_extra = 0
    if cfg.progress_token and progress is not None:
        # progress token prepended to action tokens BEFORE time fusion
        # (dm0_prog_arch.py:383-387)
        prog_tok = core.linear(params["progress_in_proj"], progress.astype(dtype))
        action_tok = jnp.concatenate([prog_tok, action_tok], axis=1)
        n_extra = 1
    cond = None
    if cfg.time_in_suffix:
        fused = jnp.concatenate(
            [action_tok, jnp.broadcast_to(time_emb[:, None, :], action_tok.shape)],
            axis=-1,
        )
        x = core.linear(params["time_mlp_in"], fused)
        x = jax.nn.silu(x)
        action_tok = core.linear(params["time_mlp_out"], x)
    else:  # pi0.5 adaRMS conditioning
        x = core.linear(params["time_mlp_in"], time_emb)
        x = jax.nn.silu(x)
        x = core.linear(params["time_mlp_out"], x)
        cond = jax.nn.silu(x)
    parts.append(action_tok)
    ar += [1] + [0] * (cfg.chunk_size - 1 + n_extra)

    tokens = jnp.concatenate(parts, axis=1)
    mask = jnp.ones((B, tokens.shape[1]), jnp.int32)
    ar = jnp.broadcast_to(jnp.asarray(ar, jnp.int32)[None, :], mask.shape)
    return tokens, mask, ar, cond


def _positions_and_grp(prefix_mask, prefix_ar, suffix_mask=None, suffix_ar=None):
    if suffix_mask is not None:
        mask = jnp.concatenate([prefix_mask, suffix_mask], axis=1)
        ar = jnp.concatenate([prefix_ar, suffix_ar], axis=1)
    else:
        mask, ar = prefix_mask, prefix_ar
    grp = jnp.cumsum(ar, axis=1)
    positions = jnp.cumsum(mask, axis=1) - 1
    return mask, grp, positions


# ---------------------------------------------------------------------------
# Train / inference
# ---------------------------------------------------------------------------


def _streams(params, cfg, prefix_tokens, suffix_tokens, cond):
    return [
        Stream(cfg.llm, params["vlm"]["llm"], prefix_tokens),
        Stream(cfg.expert, params["expert"], suffix_tokens,
               cond if cfg.adarms else None),
    ]


def flow_vla_loss(
    params, cfg: FlowVLAConfig, batch: dict, rng: jax.Array, remat: bool = False,
    noise: Optional[jnp.ndarray] = None,  # injectable (parity/replay)
    time: Optional[jnp.ndarray] = None,  # [B] injectable Beta(1.5,1) draws
):
    """Flow-matching MSE (pi0_arch.py:317-400)."""
    actions = batch["actions"].astype(jnp.float32)  # [B, chunk, action_dim]
    B = actions.shape[0]
    k_n, k_t = jax.random.split(rng)
    if noise is None:
        noise = jax.random.normal(k_n, actions.shape, jnp.float32)
    if time is None:
        time = jax.random.beta(k_t, 1.5, 1.0, (B,)).astype(jnp.float32) * 0.999 + 0.001
    t_exp = time[:, None, None]
    x_t = t_exp * noise + (1 - t_exp) * actions
    u_t = noise - actions

    images = batch["images"]
    image_masks = batch.get("image_masks")
    if image_masks is None:
        image_masks = jnp.ones(images.shape[:2], jnp.int32)
    prefix_tokens, prefix_mask, prefix_ar = embed_prefix(
        params, cfg, images, image_masks, batch["input_ids"], batch["attention_mask"]
    )
    states = batch.get("states") if cfg.use_state_token else None
    suffix_tokens, suffix_mask, suffix_ar, cond = embed_suffix(
        params, cfg, states, x_t, time, dtype=prefix_tokens.dtype
    )
    mask, grp, positions = _positions_and_grp(
        prefix_mask, prefix_ar, suffix_mask, suffix_ar
    )

    outs, _ = mot_forward(
        _streams(params, cfg, prefix_tokens, suffix_tokens, cond),
        positions=positions, q_grp=grp, q_valid=mask, remat=remat,
    )
    v_t = core.linear(params["action_out_proj"], outs[1][:, -cfg.chunk_size :])
    loss = jnp.mean(jnp.square(v_t.astype(jnp.float32) - u_t))
    return loss, {"action_loss": loss, "loss": loss}


def flow_vla_inference_action(
    params,
    cfg: FlowVLAConfig,
    input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    images: jnp.ndarray,
    image_masks: Optional[jnp.ndarray],
    states: Optional[jnp.ndarray],
    rng: jax.Array,
    num_steps: Optional[int] = None,
    progress: Optional[jnp.ndarray] = None,  # [B, 1, 1] DM0-Prog input
    noise: Optional[jnp.ndarray] = None,  # injectable initial noise (parity/replay)
):
    """Prefill prefix -> frozen KV cache -> Euler flow integration in one
    compiled program (pi0_arch.py:402-491).  With a progress input
    (DM0-Prog), returns (actions, min end-progress across Euler steps,
    dm0_prog_arch.py:485-505); else just actions."""
    num_steps = num_steps or cfg.num_flow_steps
    B = input_ids.shape[0]
    if image_masks is None:
        image_masks = jnp.ones(images.shape[:2], jnp.int32)

    prefix_tokens, prefix_mask, prefix_ar = embed_prefix(
        params, cfg, images, image_masks, input_ids, text_mask
    )
    _, prefix_grp, prefix_pos = _positions_and_grp(prefix_mask, prefix_ar)
    _, cache = mot_forward(
        [
            Stream(cfg.llm, params["vlm"]["llm"], prefix_tokens),
            Stream(cfg.expert, params["expert"], None),
        ],
        positions=prefix_pos, q_grp=prefix_grp, q_valid=prefix_mask,
        update_cache=True,
    )
    prefix_len = jnp.sum(prefix_mask, axis=1, keepdims=True)
    prefix_grp_max = prefix_grp[:, -1:]

    dt = -1.0 / num_steps
    if noise is None:
        noise = jax.random.normal(rng, (B, cfg.chunk_size, cfg.action_dim), jnp.float32)

    def step(carry, _):
        x_t, time = carry
        t_b = jnp.broadcast_to(time, (B,))
        suffix_tokens, suffix_mask, suffix_ar, cond = embed_suffix(
            params, cfg, states, x_t, t_b, dtype=prefix_tokens.dtype,
            progress=progress,
        )
        suffix_grp = jnp.cumsum(suffix_ar, axis=1) + prefix_grp_max
        suffix_pos = prefix_len + jnp.cumsum(suffix_mask, axis=1) - 1
        outs, _ = mot_forward(
            [
                Stream(cfg.llm, params["vlm"]["llm"], None),
                Stream(cfg.expert, params["expert"], suffix_tokens,
                       cond if cfg.adarms else None),
            ],
            positions=suffix_pos, q_grp=suffix_grp, q_valid=suffix_mask,
            cache=cache, update_cache=False,
        )
        v_t = core.linear(params["action_out_proj"], outs[1][:, -cfg.chunk_size :])
        if progress is not None:
            prog = core.linear(
                params["progress_out_proj"],
                outs[1][:, -cfg.chunk_size - 1 : -cfg.chunk_size],
            )
        else:
            prog = jnp.zeros((B, 1, 1), jnp.float32)
        return (x_t + v_t.astype(jnp.float32) * dt, time + dt), prog

    (x, _), progs = jax.lax.scan(
        step, (noise, jnp.asarray(1.0, jnp.float32)), None, length=num_steps
    )
    if progress is not None:
        return x, jnp.min(progs.astype(jnp.float32), axis=0)
    return x
