"""MemVLA: CogACT + perceptual-cognitive memory bank.

Behavior pinned to /root/reference/dexbotic/model/memvla/memvla_arch.py:
  * projector output compressed by an SE-bottleneck into `per` tokens
    (BottleneckSE :136-173)
  * PerCogMemBank (:195-427): per-episode banks of (timestep, feature);
    retrieval = 2 cross-attention blocks over the bank with timestep PE;
    fusion by a sigmoid gate (GateFusion :176); consolidation by FIFO or
    ToMe adjacent cosine-similarity merging (:264-306)
  * memory-conditioned DiT: zero-init cross-attention to `per` tokens per
    block (action_model/dit.py:141-181)
  * stateful inference: `episode_first_frame` resets the bank (:666-705)

TPU-native formulation: the bank is an EXPLICIT fixed-shape state pytree
([B, mem_length, N, D] + counts) threaded through jitted calls; retrieval is
masked cross-attention over (bank slots ++ working tokens); ToMe merging is
a masked gather over fixed slots.  Batch rows are parallel episode streams
(the reference's 'parallel_stream' mode); 'stream'/'group' episode-ordered
training uses the mem trainer's batch schedule (exp/mem_trainer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.models import dit as dit_mod
from dexbotic_tpu.models.vlm import VLMConfig, encode_images, gather_last_hidden, init_vlm, splice_image_embeds, vlm_forward
from dexbotic_tpu.nn import core
from dexbotic_tpu.ops.attention import attention_xla
from dexbotic_tpu.ops.diffusion import DiffusionSchedule
from dexbotic_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class MemVLAConfig:
    vlm: VLMConfig
    action_model_type: str = "DiT-B"
    action_dim: int = 7
    chunk_size: int = 16
    diffusion_steps: int = 100
    repeated_diffusion_steps: int = 4
    cfg_scale: float = 1.5
    ddim_steps: int = 10
    per_token_size: int = 256  # SE-bottleneck output channel dim
    mem_length: int = 16
    retrieval_layers: int = 2
    retrieval_heads: int = 4
    use_timestep_pe: bool = True
    fusion_type: str = "gate"  # 'gate' | 'add'
    consolidate_type: str = "tome"  # 'tome' | 'fifo'
    update_fused: bool = True

    @property
    def num_per_tokens(self) -> int:
        return self.vlm.num_image_tokens

    @property
    def dit(self) -> dit_mod.DiTConfig:
        return dit_mod.make_dit_config(
            self.action_model_type,
            token_size=self.vlm.llm.hidden_size,
            action_dim=self.action_dim,
            chunk_size=self.chunk_size,
            mem_cross_attn=True,
        )


# ---------------------------------------------------------------------------
# Modules: SE bottleneck, cross blocks, gate fusion, timestep embedder
# ---------------------------------------------------------------------------


def _se_init(key, c_in, c_out, reduction=16, hidden_ratio=0.5, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    h_se = max(1, c_in // reduction)
    h_mlp = max(1, int(c_in * hidden_ratio))
    return {
        "excite": {
            "fc1": core.linear_init(ks[0], c_in, h_se, True, dtype),
            "fc2": core.linear_init(ks[1], h_se, c_in, True, dtype),
        },
        "reduce": {
            "fc1": core.linear_init(ks[2], c_in, h_mlp, True, dtype),
            "fc2": core.linear_init(ks[3], h_mlp, c_out, True, dtype),
        },
    }


def se_bottleneck(p, x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C_in] -> [B, N, C_out]; 1x1 convs == per-token linears with a
    global-average excitation (BottleneckSE :136-173)."""
    pooled = jnp.mean(x, axis=1)  # [B, C_in] (AdaptiveAvgPool2d(1))
    w = jax.nn.sigmoid(
        core.linear(p["excite"]["fc2"], jax.nn.relu(core.linear(p["excite"]["fc1"], pooled)))
    )
    x = x * w[:, None, :]
    return core.linear(p["reduce"]["fc2"], jax.nn.relu(core.linear(p["reduce"]["fc1"], x)))


def _cross_block_init(key, dim, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "q": core.linear_init(ks[0], dim, dim, True, dtype),
        "k": core.linear_init(ks[1], dim, dim, True, dtype),
        "v": core.linear_init(ks[2], dim, dim, True, dtype),
        "attn_ln": {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)},
        "ffn": {
            "fc1": core.linear_init(ks[3], dim, dim * 4, True, dtype),
            "fc2": core.linear_init(ks[4], dim * 4, dim, True, dtype),
        },
        "ffn_ln": {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)},
    }


def cross_block(p, query, kv, kv_valid, num_heads):
    """Post-LN cross-attention block (CrossTransformerBlock :82-132).
    NOTE: the reference's attention has no out-proj (MHA built from raw
    q/k/v projections + sdpa)."""
    B, N, D = query.shape
    M = kv.shape[1]
    hd = D // num_heads
    q = core.linear(p["q"], query).reshape(B, N, num_heads, hd)
    k = core.linear(p["k"], kv).reshape(B, M, num_heads, hd)
    v = core.linear(p["v"], kv).reshape(B, M, num_heads, hd)
    grp_q = jnp.zeros((B, N), jnp.int32)
    grp_k = jnp.zeros((B, M), jnp.int32)
    attn = attention_xla(q, k, v, grp_q, grp_k, kv_valid).reshape(B, N, D)
    x = layer_norm(query + attn, p["attn_ln"]["w"], p["attn_ln"]["b"], eps=1e-5)
    ffn = core.linear(p["ffn"]["fc2"], jax.nn.gelu(core.linear(p["ffn"]["fc1"], x), approximate=False))
    return layer_norm(x + ffn, p["ffn_ln"]["w"], p["ffn_ln"]["b"], eps=1e-5)


def _gate_init(key, dim, dtype=jnp.float32):
    return {
        "proj": core.linear_init(
            key, dim * 2, dim, True, dtype,
            w_init=core.normal_init(1e-3), b_init=core.normal_init(1e-3),
        )
    }


def gate_fusion(p, x1, x2):
    scale = jax.nn.sigmoid(core.linear(p["proj"], jnp.concatenate([x1, x2], axis=-1)))
    return scale * x1 + (1 - scale) * x2


def _timestep_embedder_init(key, dim, freq=256, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc0": core.linear_init(k1, freq, dim, True, dtype),
        "fc1": core.linear_init(k2, dim, dim, True, dtype),
    }


def timestep_embed(p, t, freq=256):
    emb = dit_mod.timestep_embedding(t, freq)
    return core.linear(p["fc1"], jax.nn.silu(core.linear(p["fc0"], emb.astype(jnp.float32))))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_memvla(key, cfg: MemVLAConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    H = cfg.vlm.llm.hidden_size
    P = cfg.per_token_size
    bank = {}
    for role, dim, k in (("per", P, ks[2]), ("cog", H, ks[3])):
        kk = jax.random.split(k, cfg.retrieval_layers + 2)
        bank[role] = {
            "retrieval": [
                _cross_block_init(kk[i], dim) for i in range(cfg.retrieval_layers)
            ],
            "gate": _gate_init(kk[-2], dim),
            "time": _timestep_embedder_init(kk[-1], dim),
        }
    dit_params = dit_mod.init_dit(ks[1], cfg.dit, jnp.float32)
    dit_params["per_token_embedder"] = core.linear_init(
        ks[4], P, cfg.dit.hidden_size, True, jnp.float32,
        w_init=core.normal_init(0.02), b_init=core.zeros_init(),
    )
    return {
        "vlm": init_vlm(ks[0], cfg.vlm, dtype),
        "per_compr": _se_init(ks[5], H, P, dtype=dtype),
        "mem_bank": bank,
        "action_head": dit_params,
    }


# ---------------------------------------------------------------------------
# Memory bank state + ops (fixed shapes, jittable)
# ---------------------------------------------------------------------------


def init_mem_state(cfg: MemVLAConfig, batch: int, dtype=jnp.float32) -> dict:
    def role_state(n_tokens, dim):
        return {
            "feats": jnp.zeros((batch, cfg.mem_length, n_tokens, dim), dtype),
            "times": jnp.zeros((batch, cfg.mem_length), jnp.float32),
            "count": jnp.zeros((batch,), jnp.int32),
        }

    return {
        "per": role_state(cfg.num_per_tokens, cfg.per_token_size),
        "cog": role_state(1, cfg.vlm.llm.hidden_size),
    }


def _retrieve(bank_params, cfg, state_role, tokens, timestep):
    """Masked retrieval over [bank slots ++ working tokens] (empty-bank case
    uses the working tokens as episode memory, :363-385)."""
    B, N, D = tokens.shape
    L = cfg.mem_length
    feats = state_role["feats"].astype(tokens.dtype)  # [B, L, N, D]
    count = state_role["count"]  # [B]
    slot_valid = (jnp.arange(L)[None, :] < count[:, None]).astype(jnp.int32)  # [B, L]

    if cfg.use_timestep_pe:
        pe_bank = jax.vmap(lambda t: timestep_embed(bank_params["time"], t))(
            state_role["times"]
        )  # [B, L, D]
        pe_now = timestep_embed(bank_params["time"], timestep)  # [B, D]
    else:
        pe_bank = jnp.zeros((B, L, D), tokens.dtype)
        pe_now = jnp.zeros((B, D), tokens.dtype)

    mem_bank = (feats + pe_bank[:, :, None, :].astype(feats.dtype)).reshape(B, L * N, D)
    mem_now = tokens + pe_now[:, None, :].astype(tokens.dtype)
    kv = jnp.concatenate([mem_bank, mem_now], axis=1)  # keys carry the PE
    kv_raw = jnp.concatenate([feats.reshape(B, L * N, D), tokens], axis=1)  # values
    bank_valid = jnp.repeat(slot_valid, N, axis=1)
    now_valid = jnp.broadcast_to((count == 0)[:, None], (B, N)).astype(jnp.int32)
    kv_valid = jnp.concatenate([bank_valid, now_valid], axis=1)

    query = tokens
    for blk in bank_params["retrieval"]:
        # reference: keys = episode_mem + pe, values = episode_mem (:386-390)
        q2 = cross_block_kv(blk, query, kv, kv_raw, kv_valid, cfg.retrieval_heads)
        query = q2
    return query


def cross_block_kv(p, query, keys, values, kv_valid, num_heads):
    B, N, D = query.shape
    M = keys.shape[1]
    hd = D // num_heads
    q = core.linear(p["q"], query).reshape(B, N, num_heads, hd)
    k = core.linear(p["k"], keys).reshape(B, M, num_heads, hd)
    v = core.linear(p["v"], values).reshape(B, M, num_heads, hd)
    attn = attention_xla(
        q, k, v, jnp.zeros((B, N), jnp.int32), jnp.zeros((B, M), jnp.int32), kv_valid
    ).reshape(B, N, D)
    x = layer_norm(query + attn, p["attn_ln"]["w"], p["attn_ln"]["b"], eps=1e-5)
    ffn = core.linear(p["ffn"]["fc2"], jax.nn.gelu(core.linear(p["ffn"]["fc1"], x), approximate=False))
    return layer_norm(x + ffn, p["ffn_ln"]["w"], p["ffn_ln"]["b"], eps=1e-5)


def _consolidate_one(cfg: MemVLAConfig, feats, times, count, new_feat, new_time):
    """Append new_feat; over capacity -> ToMe merge of the most-similar
    adjacent pair (or FIFO drop).  Single episode (no batch dim)."""
    L = cfg.mem_length

    def append(_):
        f = jax.lax.dynamic_update_index_in_dim(feats, new_feat, count, 0)
        t = times.at[count].set(new_time)
        return f, t, count + 1

    def merge_append(_):
        if cfg.consolidate_type == "fifo":
            f = jnp.concatenate([feats[1:], new_feat[None]], axis=0)
            t = jnp.concatenate([times[1:], new_time[None]], axis=0)
            return f, t, jnp.asarray(L, jnp.int32)
        # ToMe: cosine sim of adjacent slots, mean over token rows (:264-286)
        a = feats[:-1].reshape(L - 1, feats.shape[1], -1)
        b = feats[1:].reshape(L - 1, feats.shape[1], -1)
        an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
        sims = jnp.mean(jnp.sum(an * bn, axis=-1), axis=-1)  # [L-1]
        idx = jnp.argmax(sims)
        merged_f = 0.5 * (feats[idx] + feats[idx + 1])
        merged_t = 0.5 * (times[idx] + times[idx + 1])
        j = jnp.arange(L)
        src = jnp.where(j < idx, j, j + 1)  # skip idx+1
        src = jnp.clip(src, 0, L - 1)
        f = jnp.take(feats, src, axis=0)
        f = jnp.where((j == idx)[:, None, None], merged_f[None], f)
        t = jnp.take(times, src, axis=0)
        t = jnp.where(j == idx, merged_t, t)
        f = f.at[L - 1].set(new_feat)
        t = t.at[L - 1].set(new_time)
        return f, t, jnp.asarray(L, jnp.int32)

    return jax.lax.cond(count < L, append, merge_append, operand=None)


def bank_step(params, cfg: MemVLAConfig, state: dict, per_tokens, cog_tokens, timesteps):
    """Retrieve + fuse + consolidate for both roles.  Returns
    (fused_per, fused_cog, new_state).  timesteps: float[B]."""
    out = {}
    new_state = {}
    for role, tokens in (("per", per_tokens), ("cog", cog_tokens)):
        bp = params["mem_bank"][role]
        st = state[role]
        retrieved = _retrieve(bp, cfg, st, tokens, timesteps)
        if cfg.fusion_type == "gate":
            fused = gate_fusion(bp["gate"], tokens, retrieved)
        else:
            fused = 0.5 * (tokens + retrieved)
        store = fused if cfg.update_fused else tokens
        f, t, c = jax.vmap(
            lambda fe, ti, co, nf, nt: _consolidate_one(cfg, fe, ti, co, nf, nt)
        )(st["feats"], st["times"], st["count"], store.astype(st["feats"].dtype), timesteps)
        new_state[role] = {"feats": f, "times": t, "count": c}
        out[role] = fused
    return out["per"], out["cog"], new_state


def bank_step_sequential(params, cfg: MemVLAConfig, state1: dict, per_tokens,
                         cog_tokens, timesteps, resets):
    """'group'/'stream' dataloader semantics (memvla_arch.py:329-360): the
    batch rows are CONSECUTIVE FRAMES of one episode sharing a single bank —
    row i retrieves against memory that already holds rows 0..i-1's
    consolidated (detached) features.  A lax.scan over rows threads the
    single-episode bank (state1 = init_mem_state(cfg, 1)); ``resets`` (bool
    [B]) clears it before a row (episode start, or every batch head in
    'group' mode, where the reference clears banks each forward).  Returns
    (fused_per [B,..], fused_cog [B,..], final state1)."""
    def row(st, inp):
        p_i, c_i, t_i, r_i = inp
        st = jax.tree.map(
            lambda a, b: jnp.where(r_i, a, b),
            reset_mem_rows(st, jnp.ones((1,), bool)), st,
        )
        per_f, cog_f, st = bank_step(
            params, cfg, st, p_i[None], c_i[None], t_i[None]
        )
        st = jax.tree.map(jax.lax.stop_gradient, st)
        return st, (per_f[0], cog_f[0])

    state1, (per_f, cog_f) = jax.lax.scan(
        row, state1,
        (per_tokens, cog_tokens, timesteps.astype(jnp.float32), resets),
    )
    return per_f, cog_f, state1


def reset_mem_rows(state: dict, reset_mask: jnp.ndarray) -> dict:
    """Zero the bank rows where reset_mask (bool[B]) — episode_first_frame."""
    def reset_role(st):
        m = reset_mask
        return {
            "feats": jnp.where(m[:, None, None, None], 0.0, st["feats"]),
            "times": jnp.where(m[:, None], 0.0, st["times"]),
            "count": jnp.where(m, 0, st["count"]),
        }

    return {r: reset_role(st) for r, st in state.items()}


# ---------------------------------------------------------------------------
# Forward: loss + stateful inference
# ---------------------------------------------------------------------------


def _encode(params, cfg: MemVLAConfig, input_ids, valid, images):
    feats = encode_images(params["vlm"], cfg.vlm, images)  # projector output
    embeds = splice_image_embeds(params["vlm"], cfg.vlm, input_ids, feats)
    hidden, _ = vlm_forward(params["vlm"], cfg.vlm, input_ids, valid, inputs_embeds=embeds)
    cog = gather_last_hidden(hidden, valid)[:, None, :]  # [B, 1, H]
    per = se_bottleneck(params["per_compr"], feats)  # [B, P, per_size]
    return per, cog


def memvla_loss(params, cfg: MemVLAConfig, batch: dict, state: dict, rng: jax.Array,
                sequential_bank: bool = False,
                diffusion_t: Optional[jnp.ndarray] = None,  # [B*rep] (parity)
                diffusion_noise: Optional[jnp.ndarray] = None):
    """Diffusion loss with memory-fused cog/per conditioning.  batch must
    carry 'timesteps' (float[B] in-episode frame index) and optionally
    'episode_reset' (bool[B]); returns (loss, metrics, new_state).

    sequential_bank=True is the 'group'/'stream' dataloader semantics: the
    batch is consecutive frames of ONE episode sharing a single bank
    (state = init_mem_state(cfg, 1)); default is parallel_stream (per-row
    banks)."""
    per, cog = _encode(params, cfg, batch["input_ids"], batch["attention_mask"], batch["images"])
    if sequential_bank:
        resets = batch.get("episode_reset")
        if resets is None:
            resets = jnp.zeros((per.shape[0],), bool)
        per_f, cog_f, new_state = bank_step_sequential(
            params, cfg, state, per, cog, batch["timesteps"], resets
        )
    else:
        if "episode_reset" in batch:
            state = reset_mem_rows(state, batch["episode_reset"])
        per_f, cog_f, new_state = bank_step(
            params, cfg, state, per, cog, batch["timesteps"].astype(jnp.float32)
        )

    actions = batch["actions"].reshape(cog.shape[0], -1, cfg.action_dim)
    actions = actions[:, : cfg.chunk_size].astype(jnp.float32)
    rep = cfg.repeated_diffusion_steps
    actions_rep = jnp.tile(actions, (rep, 1, 1))
    cog_rep = jnp.tile(cog_f.astype(jnp.float32), (rep, 1, 1))
    per_emb = core.linear(params["action_head"]["per_token_embedder"], per_f.astype(jnp.float32))
    per_rep = jnp.tile(per_emb, (rep, 1, 1))

    k_drop, k_diff = jax.random.split(rng)
    sched = DiffusionSchedule.create(cfg.diffusion_steps)

    def eps_fn(x_t, t):
        return dit_mod.dit_forward(
            params["action_head"], cfg.dit, x_t, t, cog_rep,
            mem=per_rep,
            drop_rng=None if diffusion_noise is not None else k_drop,
        )

    loss = sched.training_loss(eps_fn, actions_rep, k_diff,
                               t=diffusion_t, noise=diffusion_noise)
    return loss, {"action_loss": loss, "loss": loss}, new_state


def memvla_inference_action(
    params, cfg: MemVLAConfig, input_ids, valid, images, state: dict,
    timestep: jnp.ndarray, rng: jax.Array, cfg_scale: Optional[float] = None,
    noise: Optional[jnp.ndarray] = None,  # injectable initial noise (parity/replay)
):
    """One serving step: returns (actions [B,chunk,dim], new_state).
    Callers reset `state` on episode_first_frame (reset_mem_rows)."""
    cfg_scale = cfg.cfg_scale if cfg_scale is None else cfg_scale
    per, cog = _encode(params, cfg, input_ids, valid, images)
    per_f, cog_f, new_state = bank_step(
        params, cfg, state, per, cog, timestep.astype(jnp.float32)
    )
    B = cog_f.shape[0]
    per_emb = core.linear(params["action_head"]["per_token_embedder"], per_f.astype(jnp.float32))
    head = params["action_head"]
    if noise is None:
        noise = jax.random.normal(rng, (B, cfg.chunk_size, cfg.action_dim), jnp.float32)
    sched = DiffusionSchedule.create(cfg.diffusion_steps)

    if cfg_scale > 1.0:
        uncond = jnp.broadcast_to(head["uncondition"][None, None, :], (B, 1, cog_f.shape[-1]))
        z = jnp.concatenate([cog_f.astype(jnp.float32), uncond.astype(jnp.float32)], axis=0)
        noise2 = jnp.concatenate([noise, noise], axis=0)
        per2 = jnp.tile(per_emb, (2, 1, 1))

        def eps_fn(x, t):
            return dit_mod.dit_forward_with_cfg(head, cfg.dit, x, t, z, cfg_scale, mem=per2)

        samples = sched.ddim_sample(eps_fn, noise2, cfg.ddim_steps)[:B]
    else:
        def eps_fn(x, t):
            return dit_mod.dit_forward(head, cfg.dit, x, t, cog_f.astype(jnp.float32), mem=per_emb)

        samples = sched.ddim_sample(eps_fn, noise, cfg.ddim_steps)
    return samples, new_state
