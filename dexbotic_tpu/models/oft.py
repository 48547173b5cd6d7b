"""OFT (OpenVLA-OFT) policies: L1 regression, diffusion, and discrete heads.

Behavior pinned to /root/reference/dexbotic/model/oft/{oft_arch.py,
oft_discrete_arch.py, action_model/model.py}:
  * learned action-query embeddings (L1/Discrete) or projected noisy-action +
    timestep embeddings (Diffusion) are appended after the non-padded prompt
    and run through the LLM once; hidden states at those positions feed an
    MLPResNet head (L1 regression / noise prediction) or lm_head bin logits
    (Discrete parallel decoding over the last num_bins-1 vocab slots).
  * optional proprio token prepended to the action segment.

TPU-first formulation: the padded prompt stays in place and the action
segment is appended at the END of the padded sequence with causal
cumsum(valid) groups and explicit positions — identical attention pattern
and RoPE positions as the reference's per-row insert-and-repad, but static
shapes.  Diffusion inference prefills the prompt into a frozen KV cache once
and re-runs only the action segment per DDIM step (the reference re-encodes
the full VLM every step, oft_arch.py:232-249).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.models.vlm import VLMConfig, encode_images, init_vlm, splice_image_embeds
from dexbotic_tpu.nn import core
from dexbotic_tpu.nn.transformer import Stream, lm_logits, mot_forward
from dexbotic_tpu.ops.diffusion import DiffusionSchedule
from dexbotic_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class OFTConfig:
    vlm: VLMConfig
    action_model_type: str = "L1"  # 'L1' | 'Diffusion' | 'Discrete'
    action_dim: int = 7
    chunk_size: int = 16
    use_proprio: bool = False
    proprio_dim: Optional[int] = None
    num_bins: int = 256
    num_diffusion_steps: int = 100
    ddim_steps: int = 10
    # Replicate the reference's discrete-decode bin slice EXACTLY, including
    # its off-by-one: it reads the last num_bins-1 vocab slots
    # (oft_discrete_arch.py:223 `[-num_bins+1:]`) while mapping indices with a
    # (num_bins-1) denominator — so every decoded action is shifted one bin
    # relative to the train-time labels.  Default True: checkpoint REPLAY of
    # DB-OFT-Discrete weights must be bin-for-bin identical.  Set False for
    # from-scratch training to get the corrected full-range slice.
    reference_parity: bool = True

    @property
    def num_action_tokens(self) -> int:
        return self.chunk_size * self.action_dim

    @property
    def hidden(self) -> int:
        return self.vlm.llm.hidden_size


# ---------------------------------------------------------------------------
# MLPResNet (action_model/model.py:83-126)
# ---------------------------------------------------------------------------


def _ln_init(dim):
    return {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def mlp_resnet_init(key, num_blocks, input_dim, hidden_dim, output_dim, dtype=jnp.float32):
    ks = jax.random.split(key, num_blocks + 2)
    p = {
        "ln1": _ln_init(input_dim),
        "fc1": core.linear_init(ks[0], input_dim, hidden_dim, True, dtype),
        "ln2": _ln_init(hidden_dim),
        "fc2": core.linear_init(ks[1], hidden_dim, output_dim, True, dtype),
        "blocks": [
            {
                "ln": _ln_init(hidden_dim),
                "fc": core.linear_init(ks[2 + i], hidden_dim, hidden_dim, True, dtype),
            }
            for i in range(num_blocks)
        ],
    }
    return p


def mlp_resnet(p, x):
    x = layer_norm(x, p["ln1"]["w"], p["ln1"]["b"], eps=1e-5)
    x = jax.nn.relu(core.linear(p["fc1"], x))
    for blk in p["blocks"]:
        h = layer_norm(x, blk["ln"]["w"], blk["ln"]["b"], eps=1e-5)
        x = x + jax.nn.relu(core.linear(blk["fc"], h))
    x = layer_norm(x, p["ln2"]["w"], p["ln2"]["b"], eps=1e-5)
    return core.linear(p["fc2"], x)


def proprio_projector_init(key, llm_dim, proprio_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": core.linear_init(k1, proprio_dim, llm_dim, True, dtype),
        "fc2": core.linear_init(k2, llm_dim, llm_dim, True, dtype),
    }


def proprio_projector(p, x):
    return core.linear(p["fc2"], jax.nn.gelu(core.linear(p["fc1"], x), approximate=False))


def sinusoidal_time_encoding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """diffusion-policy style [sin, cos] (model.py:57-80)."""
    half = dim // 2
    exponent = jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1))
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_oft(key, cfg: OFTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    H = cfg.hidden
    head: dict = {}
    t = cfg.action_model_type
    if "L1" in t:
        head["action_query"] = jnp.zeros((cfg.num_action_tokens, H), dtype)
        head["mlp"] = mlp_resnet_init(ks[0], 2, H * cfg.action_dim, H, cfg.action_dim, dtype)
    elif "Diffusion" in t:
        k1, k2 = jax.random.split(ks[0])
        head["noisy_action_projector"] = {
            "fc1": core.linear_init(k1, 1, H, True, dtype),
            "fc2": core.linear_init(k2, H, H, True, dtype),
        }
        head["noise_predictor"] = mlp_resnet_init(
            ks[1], 2, H * cfg.action_dim, H, cfg.action_dim, dtype
        )
    elif "Discrete" in t:
        pass  # queries are embeddings of token id 1; logits via lm_head
    else:
        raise ValueError(t)
    if cfg.use_proprio:
        head["proprio_projector"] = proprio_projector_init(ks[2], H, cfg.proprio_dim, dtype)
    return {"vlm": init_vlm(ks[3], cfg.vlm, dtype), "action_head": head}


# ---------------------------------------------------------------------------
# Core: prompt + appended action segment through the LLM
# ---------------------------------------------------------------------------


def _prompt_embeds(params, cfg: OFTConfig, input_ids, valid, images,
                   remat: bool = False):
    feats = encode_images(params["vlm"], cfg.vlm, images, remat=remat)
    return splice_image_embeds(params["vlm"], cfg.vlm, input_ids, feats)


def _action_segment(params, cfg: OFTConfig, B, dtype, states, noisy=None, time_emb=None):
    """Build the appended segment [proprio?; time?; action tokens]."""
    head = params["action_head"]
    t = cfg.action_model_type
    if "L1" in t:
        seg = jnp.broadcast_to(
            head["action_query"].astype(dtype)[None], (B, cfg.num_action_tokens, cfg.hidden)
        )
    elif "Diffusion" in t:
        na = noisy.reshape(B, cfg.num_action_tokens, 1).astype(dtype)
        p = head["noisy_action_projector"]
        seg = core.linear(p["fc2"], jax.nn.gelu(core.linear(p["fc1"], na), approximate=False))
        seg = jnp.concatenate([time_emb.astype(dtype)[:, None, :], seg], axis=1)
    else:  # Discrete: embeddings of token id 1 (action_model/model.py:296)
        ones = jnp.ones((B, cfg.num_action_tokens), jnp.int32)
        seg = core.embed(params["vlm"]["llm"]["embed"], ones).astype(dtype)
    if cfg.use_proprio:
        st = proprio_projector(head["proprio_projector"], states.astype(dtype))
        seg = jnp.concatenate([st.reshape(B, -1, cfg.hidden), seg], axis=1)
    return seg


def _run_with_segment(params, cfg, prompt_embeds, prompt_valid, segment,
                      cache=None, remat=False):
    """Append segment after the padded prompt; return hidden at segment
    positions.  cache!=None: prompt is already prefilled -> run segment only."""
    B, A = segment.shape[0], segment.shape[1]
    pv = prompt_valid.astype(jnp.int32)
    prompt_len = jnp.sum(pv, axis=1, keepdims=True)
    seg_valid = jnp.ones((B, A), jnp.int32)
    if cache is None:
        embeds = jnp.concatenate([prompt_embeds, segment], axis=1)
        valid = jnp.concatenate([pv, seg_valid], axis=1)
        grp = jnp.cumsum(valid, axis=1)
        pos = grp - 1
        outs, _ = mot_forward(
            [Stream(cfg.vlm.llm, params["vlm"]["llm"], embeds)],
            positions=pos, q_grp=grp, q_valid=valid, remat=remat,
        )
        return outs[0][:, -A:]
    # segment-only against frozen prompt cache
    grp = prompt_len + jnp.cumsum(seg_valid, axis=1)
    pos = prompt_len + jnp.cumsum(seg_valid, axis=1) - 1
    outs, _ = mot_forward(
        [Stream(cfg.vlm.llm, params["vlm"]["llm"], segment)],
        positions=pos, q_grp=grp, q_valid=seg_valid,
        cache=cache, update_cache=False,
    )
    return outs[0][:, -A:]


def _prefill_prompt(params, cfg, prompt_embeds, prompt_valid):
    pv = prompt_valid.astype(jnp.int32)
    grp = jnp.cumsum(pv, axis=1)
    pos = grp - 1
    _, cache = mot_forward(
        [Stream(cfg.vlm.llm, params["vlm"]["llm"], prompt_embeds)],
        positions=pos, q_grp=grp, q_valid=pv, update_cache=True,
    )
    return cache


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def oft_loss(params, cfg: OFTConfig, batch: dict, rng: jax.Array, remat: bool = False,
             diffusion_t: Optional[jnp.ndarray] = None,  # [B] injectable (parity)
             diffusion_noise: Optional[jnp.ndarray] = None):  # [B, chunk, dim]
    """L1 / diffusion-MSE / discrete-CE training loss."""
    B = batch["input_ids"].shape[0]
    actions = batch["actions"].reshape(B, -1, cfg.action_dim)[:, : cfg.chunk_size]
    actions = actions.astype(jnp.float32)
    states = batch.get("states")
    prompt = _prompt_embeds(params, cfg, batch["input_ids"], batch["attention_mask"], batch["images"])
    t = cfg.action_model_type

    if "Diffusion" in t:
        sched = DiffusionSchedule.create(cfg.num_diffusion_steps)
        k_t, k_n = jax.random.split(rng)
        ts = (jax.random.randint(k_t, (B,), 0, cfg.num_diffusion_steps)
              if diffusion_t is None else diffusion_t)
        noise = (jax.random.normal(k_n, actions.shape, jnp.float32)
                 if diffusion_noise is None else diffusion_noise)
        noisy = sched.q_sample(actions, ts, noise)
        time_emb = sinusoidal_time_encoding(ts, cfg.hidden)
        seg = _action_segment(params, cfg, B, prompt.dtype, states, noisy, time_emb)
        hid = _run_with_segment(params, cfg, prompt, batch["attention_mask"], seg)
        if cfg.use_proprio:
            hid = hid[:, 1:]
        hid = hid[:, 1:]  # drop timestep token
        pred = mlp_resnet(
            params["action_head"]["noise_predictor"],
            hid.reshape(B, cfg.chunk_size, -1).astype(jnp.float32),
        )
        loss = jnp.mean(jnp.square(pred - noise))
        return loss, {"action_loss": loss, "loss": loss}

    seg = _action_segment(params, cfg, B, prompt.dtype, states)
    hid = _run_with_segment(params, cfg, prompt, batch["attention_mask"], seg)
    if cfg.use_proprio:
        hid = hid[:, 1:]

    if "L1" in t:
        pred = mlp_resnet(
            params["action_head"]["mlp"],
            hid.reshape(B, cfg.chunk_size, -1).astype(jnp.float32),
        )
        loss = jnp.mean(jnp.abs(actions - pred))
        return loss, {"action_loss": loss, "loss": loss}

    # Discrete: CE over bin labels (last num_bins vocab slots hold the bins)
    logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hid).astype(jnp.float32)
    labels = batch["action_bins"].reshape(B, -1)  # int [B, chunk*action_dim]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss = jnp.mean(nll)
    return loss, {"action_loss": loss, "loss": loss}


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------


def oft_inference_action(
    params, cfg: OFTConfig, input_ids, valid, images,
    states=None, rng: Optional[jax.Array] = None, ddim_steps: Optional[int] = None,
    noise: Optional[jnp.ndarray] = None,  # injectable initial noise (parity/replay)
):
    """Normalized action chunk [B, chunk, action_dim], one compiled program."""
    B = input_ids.shape[0]
    prompt = _prompt_embeds(params, cfg, input_ids, valid, images)
    t = cfg.action_model_type

    if "L1" in t:
        seg = _action_segment(params, cfg, B, prompt.dtype, states)
        hid = _run_with_segment(params, cfg, prompt, valid, seg)
        if cfg.use_proprio:
            hid = hid[:, 1:]
        return mlp_resnet(
            params["action_head"]["mlp"],
            hid.reshape(B, cfg.chunk_size, -1).astype(jnp.float32),
        )

    if "Discrete" in t:
        seg = _action_segment(params, cfg, B, prompt.dtype, states)
        hid = _run_with_segment(params, cfg, prompt, valid, seg)
        if cfg.use_proprio:
            hid = hid[:, 1:]
        logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hid)
        bins = jnp.argmax(logits[:, :, -decode_slots(cfg) :], axis=-1)
        return bins_to_continuous(bins, cfg)

    # Diffusion: prefill prompt once, DDIM over the segment only
    ddim_steps = ddim_steps or cfg.ddim_steps
    sched = DiffusionSchedule.create(cfg.num_diffusion_steps)
    cache = _prefill_prompt(params, cfg, prompt, valid)
    if noise is None:
        noise = jax.random.normal(rng, (B, cfg.chunk_size, cfg.action_dim), jnp.float32)

    def eps_fn(x, ts):
        time_emb = sinusoidal_time_encoding(ts, cfg.hidden)
        seg = _action_segment(params, cfg, B, prompt.dtype, states, x, time_emb)
        hid = _run_with_segment(params, cfg, None, valid, seg, cache=cache)
        if cfg.use_proprio:
            hid = hid[:, 1:]
        hid = hid[:, 1:]
        return mlp_resnet(
            params["action_head"]["noise_predictor"],
            hid.reshape(B, cfg.chunk_size, -1).astype(jnp.float32),
        )

    return sched.ddim_sample(eps_fn, noise, ddim_steps)


def decode_slots(cfg: OFTConfig) -> int:
    """Trailing vocab slots read at discrete decode.

    reference_parity=True replicates `[-num_bins+1:]`
    (oft_discrete_arch.py:223,265): num_bins-1 slots, so decoded indices are
    shifted one bin vs the labels; False reads the full num_bins range.
    """
    return cfg.num_bins - 1 if cfg.reference_parity else cfg.num_bins


def bins_to_continuous(bins: jnp.ndarray, cfg: OFTConfig) -> jnp.ndarray:
    """bin indices -> [-1, 1] (action_model/model.py:325-347)."""
    a = bins.reshape(bins.shape[0], cfg.chunk_size, cfg.action_dim).astype(jnp.float32)
    return (a / (cfg.num_bins - 1)) * 2.0 - 1.0


def continuous_to_bins(actions: jnp.ndarray, cfg: OFTConfig) -> jnp.ndarray:
    a = jnp.clip(actions, -1.0, 1.0)
    return jnp.round((a + 1) / 2 * (cfg.num_bins - 1)).astype(jnp.int32)


def oft_generate_action(
    params, cfg: OFTConfig, input_ids, valid, images, states, rng, temperature: float = 1.0
):
    """Sampled parallel discrete decode for RL rollouts
    (oft_discrete_arch.py:238-282).  Returns (actions, bin_indices, log_probs)."""
    assert "Discrete" in cfg.action_model_type
    B = input_ids.shape[0]
    prompt = _prompt_embeds(params, cfg, input_ids, valid, images)
    seg = _action_segment(params, cfg, B, prompt.dtype, states)
    hid = _run_with_segment(params, cfg, prompt, valid, seg)
    if cfg.use_proprio:
        hid = hid[:, 1:]
    logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hid).astype(jnp.float32)
    logits = logits[:, :, -decode_slots(cfg) :] / temperature
    bins = jax.random.categorical(rng, logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    chosen_logp = jnp.take_along_axis(logp, bins[..., None], axis=-1)[..., 0]
    return bins_to_continuous(bins, cfg), bins, chosen_logp


def oft_action_log_probs(
    params, cfg: OFTConfig, input_ids, valid, images, states, bins,
    temperature: float = 1.0, remat: bool = False,
):
    """Log-probs (and entropy) of given bin actions under current params —
    the RL recompute-logprob path (exp/rl/rl_trainer.py:265-736).  remat
    checkpoints the tower+decoder forward: without it the PPO backward
    stashes every ViT layer's activations (a 1b actor at micro-batch 8 /
    so400m-224 OOMs one v5e on exactly those buffers)."""
    B = input_ids.shape[0]
    prompt = _prompt_embeds(params, cfg, input_ids, valid, images, remat=remat)
    seg = _action_segment(params, cfg, B, prompt.dtype, states)
    hid = _run_with_segment(params, cfg, prompt, valid, seg, remat=remat)
    if cfg.use_proprio:
        hid = hid[:, 1:]
    logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hid).astype(jnp.float32)
    logits = logits[:, :, -decode_slots(cfg) :] / temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(logp, bins[..., None], axis=-1)[..., 0]
    probs = jnp.exp(logp)
    entropy = -jnp.sum(probs * logp, axis=-1)
    return chosen, entropy
