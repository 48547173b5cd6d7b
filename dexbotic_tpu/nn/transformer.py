"""Unified decoder engine + mixture-of-transformers (MoT) joint attention.

One configurable decoder covers every backbone in the model zoo
(LLaMA / Qwen2 / Qwen3 / Gemma families) and every action expert, including
pi0.5's adaptive-RMSNorm variant.  The MoT engine generalizes the reference's
per-layer QKV-concat joint attention (/root/reference/dexbotic/model/pi0/
pi0_arch.py:116-228 and dm0/dm0_arch.py:145-268) to N streams sharing one
attention call per layer, implemented as a `lax.scan` over stacked layer
params so compile time stays flat in depth.

Cache model: a fixed-shape KV cache pytree with a `length` pointer.
  * prefill: write tokens at offset 0 (optionally into a larger buffer).
  * AR decode: append at `length` (dynamic_update_slice).
  * pi0-style denoise: `update_cache=False` — new KV is concatenated for the
    attention call but never written back (read-only prefix, streamed suffix).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from dexbotic_tpu.nn import core, moe
from dexbotic_tpu.ops.attention import attention as _attention
from dexbotic_tpu.ops.norms import rms_norm
from dexbotic_tpu.ops.rope import apply_rope, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Geometry + flavor flags for one decoder stack."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    act: str = "silu"
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    norm_offset: float = 0.0  # 1.0 for Gemma-style (1 + w) RMSNorm scales
    qk_norm: bool = False  # Qwen3 per-head q/k RMSNorm
    attn_bias: bool = False  # Qwen2 qkv biases
    embed_scale: bool = False  # Gemma: embeddings * sqrt(hidden)
    tie_embeddings: bool = True
    has_embed: bool = True  # action experts strip embed_tokens
    adarms_cond_dim: Optional[int] = None  # pi0.5 action expert
    attn_scale: Optional[float] = None  # default head_dim**-0.5
    attn_impl: str = "auto"
    # Mixture-of-Experts FFN (beyond reference — see nn/moe.py). When set,
    # every layer's MLP becomes a top-k routed expert bank; expert weights
    # carry a leading [num_experts] axis sharded by the 'expert' mesh axis.
    moe_num_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 2.0

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


@dataclasses.dataclass(frozen=True)
class Stream:
    """One expert participating in joint attention."""

    cfg: TransformerConfig
    params: Any
    embeds: Optional[jnp.ndarray]  # [B, T_i, H_i] or None (stream inactive)
    cond: Optional[jnp.ndarray] = None  # adaRMS condition [B, cond_dim]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _norm_init(key, cfg: TransformerConfig, dim: int):
    if cfg.adarms_cond_dim is not None:
        return {
            "dense": core.linear_init(
                key,
                cfg.adarms_cond_dim,
                dim * 3,
                use_bias=True,
                w_init=core.zeros_init(),
                b_init=core.zeros_init(),
            )
        }
    init = core.zeros_init() if cfg.norm_offset else core.ones_init()
    return {"w": init(key, (dim,), jnp.float32)}


def _layer_init(key, cfg: TransformerConfig, dtype):
    ks = jax.random.split(key, 10)
    p = {
        "ln1": _norm_init(ks[0], cfg, cfg.hidden_size),
        "ln2": _norm_init(ks[1], cfg, cfg.hidden_size),
        "attn": {
            "q": core.linear_init(ks[2], cfg.hidden_size, cfg.q_dim, cfg.attn_bias, dtype),
            "k": core.linear_init(ks[3], cfg.hidden_size, cfg.kv_dim, cfg.attn_bias, dtype),
            "v": core.linear_init(ks[4], cfg.hidden_size, cfg.kv_dim, cfg.attn_bias, dtype),
            "o": core.linear_init(ks[5], cfg.q_dim, cfg.hidden_size, False, dtype),
        },
        "mlp": (
            moe.moe_init(ks[6], cfg.hidden_size, cfg.intermediate_size, cfg.moe_num_experts, dtype)
            if cfg.moe_num_experts
            else core.gated_mlp_init(ks[6], cfg.hidden_size, cfg.intermediate_size, dtype)
        ),
    }
    if cfg.qk_norm:
        init = core.zeros_init() if cfg.norm_offset else core.ones_init()
        p["attn"]["q_norm"] = {"w": init(ks[7], (cfg.head_dim,), jnp.float32)}
        p["attn"]["k_norm"] = {"w": init(ks[8], (cfg.head_dim,), jnp.float32)}
    return p


def init_transformer(key, cfg: TransformerConfig, dtype=jnp.float32):
    """Params with layers stacked on a leading [num_layers] axis (scan-ready)."""
    k_embed, k_norm, k_layers, k_head = jax.random.split(key, 4)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    layers = jax.vmap(lambda k: _layer_init(k, cfg, dtype))(layer_keys)
    params = {"layers": layers, "norm": _norm_init(k_norm, cfg, cfg.hidden_size)}
    if cfg.has_embed:
        params["embed"] = core.embed_init(k_embed, cfg.vocab_size, cfg.hidden_size, dtype)
        if not cfg.tie_embeddings:
            params["lm_head"] = core.linear_init(
                k_head, cfg.hidden_size, cfg.vocab_size, False, dtype
            )
    return params


def embed_tokens(params, cfg: TransformerConfig, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    x = core.embed(params["embed"], ids)
    if dtype is not None:
        x = x.astype(dtype)
    if cfg.embed_scale:
        x = x * jnp.asarray(cfg.hidden_size**0.5, dtype=x.dtype)
    return x


def lm_logits(params, cfg: TransformerConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if "lm_head" in params:
        return core.linear(params["lm_head"], hidden)
    e = params["embed"]["embedding"]
    if isinstance(e, dict):  # int8-quantized tied embedding (ops/quant.py)
        return (hidden @ e["q"].astype(hidden.dtype).T) * e["s"].astype(hidden.dtype).T
    return hidden @ e.astype(hidden.dtype).T


# ---------------------------------------------------------------------------
# Norms with optional adaRMS conditioning
# ---------------------------------------------------------------------------


def _apply_norm(p, cfg: TransformerConfig, x, cond):
    """Returns (normed, gate_or_None); adaRMS per pi0.5's fork semantics
    (/root/reference/dexbotic/model/pi05/transformers_pi05/gemma/
    modeling_gemma.py:62-89)."""
    if "dense" in p and cond is not None:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + cfg.rms_eps)
        mod = core.linear(p["dense"], cond.astype(jnp.float32))  # [B, 3H]
        scale, shift, gate = jnp.split(mod, 3, axis=-1)
        normed = normed * (1.0 + scale[:, None, :]) + shift[:, None, :]
        return normed.astype(dtype), gate.astype(dtype)
    return rms_norm(x, p["w"], eps=cfg.rms_eps, weight_offset=cfg.norm_offset), None


def _gated_residual(x, y, gate):
    if gate is None:
        return x + y
    return x + y * gate[:, None, :]


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(
    cfg: TransformerConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> dict:
    return {
        "k": jnp.zeros((cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim), dtype),
        "v": jnp.zeros((cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim), dtype),
        "grp": jnp.zeros((batch, max_len), jnp.int32),
        "valid": jnp.zeros((batch, max_len), jnp.int32),
        "seg": jnp.zeros((batch, max_len), jnp.int32),
        "length": jnp.zeros((), jnp.int32),
    }


# ---------------------------------------------------------------------------
# MoT forward
# ---------------------------------------------------------------------------


def mot_forward(
    streams: Sequence[Stream],
    positions: jnp.ndarray,  # int[B, T] rope positions of the NEW tokens
    q_grp: jnp.ndarray,  # int[B, T] attention group of the NEW tokens
    q_valid: jnp.ndarray,  # int/bool[B, T]
    cache: Optional[dict] = None,
    update_cache: bool = False,
    remat=False,  # False | True (full per-layer) | "dots" (save matmul outs)
    q_seg: Optional[jnp.ndarray] = None,  # int[B, T] packed-sequence ids
    write_cols: Optional[jnp.ndarray] = None,  # int[B] per-row cache columns
    want_aux: bool = False,  # also return {"moe_aux": scalar} (MoE LB loss)
):
    """Joint attention over N decoder streams.

    The active streams' embeddings are concatenated along the sequence axis;
    every layer computes per-stream QKV with its own weights, runs ONE
    attention over the concatenation (+ any cached KV), then splits back to
    per-stream MLP/residuals.

    Returns (outs, cache): outs is a list aligned with `streams` (None for
    inactive streams), each final-normed; cache is the (possibly updated)
    KV cache, or a freshly created one when update_cache=True and cache=None.

    ``write_cols`` (requires cache + update_cache): row b's T new tokens are
    written at columns write_cols[b]..write_cols[b]+T-1 instead of at the
    shared ``length`` cursor — the continuous-batching path
    (exp/decode_engine.py) where each slot sits at a different depth.  The
    scalar ``length`` cursor is left untouched; callers own per-row
    occupancy.  Buffer columns are storage, not logical positions: RoPE uses
    ``positions`` and masking uses grp/valid, so rows may interleave freely.
    """
    active = [s for s in streams if s.embeds is not None]
    assert active, "at least one stream must have embeddings"
    base = streams[0].cfg
    for s in streams:
        assert (s.cfg.num_heads, s.cfg.num_kv_heads, s.cfg.head_dim) == (
            base.num_heads,
            base.num_kv_heads,
            base.head_dim,
        ), "MoT streams must share attention geometry"
        assert s.cfg.num_layers == base.num_layers

    seq_lens = [0 if s.embeds is None else s.embeds.shape[1] for s in streams]
    T = sum(seq_lens)
    B = active[0].embeds.shape[0]
    compute_dtype = active[0].embeds.dtype
    scale = base.attn_scale if base.attn_scale is not None else base.head_dim**-0.5

    cos, sin = rope_cos_sin(positions, base.head_dim, base.rope_theta)

    if update_cache and cache is None:
        cache = init_kv_cache(base, B, T, dtype=compute_dtype)

    if q_seg is None:
        q_seg_arr = jnp.zeros(q_grp.shape, jnp.int32)
    else:
        q_seg_arr = q_seg.astype(jnp.int32)
    if write_cols is not None:
        assert cache is not None and update_cache, "write_cols needs a cache update"
        row_ix = jnp.arange(q_grp.shape[0])[:, None]
        col_ix = write_cols[:, None] + jnp.arange(T)[None, :]
    if cache is not None:
        start = cache["length"]
        cache_seg = cache.get("seg")
        if cache_seg is None:
            cache_seg = jnp.zeros(cache["grp"].shape, jnp.int32)
        if update_cache and write_cols is not None:
            kv_grp = cache["grp"].at[row_ix, col_ix].set(q_grp.astype(jnp.int32))
            kv_valid = cache["valid"].at[row_ix, col_ix].set(q_valid.astype(jnp.int32))
            kv_seg = cache_seg.at[row_ix, col_ix].set(q_seg_arr)
        elif update_cache:
            kv_grp = jax.lax.dynamic_update_slice(cache["grp"], q_grp.astype(jnp.int32), (0, start))
            kv_valid = jax.lax.dynamic_update_slice(
                cache["valid"], q_valid.astype(jnp.int32), (0, start)
            )
            kv_seg = jax.lax.dynamic_update_slice(cache_seg, q_seg_arr, (0, start))
        else:
            kv_grp = jnp.concatenate([cache["grp"], q_grp.astype(jnp.int32)], axis=1)
            kv_valid = jnp.concatenate([cache["valid"], q_valid.astype(jnp.int32)], axis=1)
            kv_seg = jnp.concatenate([cache_seg, q_seg_arr], axis=1)
    else:
        start = None
        kv_grp = q_grp.astype(jnp.int32)
        kv_valid = q_valid.astype(jnp.int32)
        kv_seg = q_seg_arr

    def body(carry, layer_xs):
        xs_embeds = carry  # tuple of per-stream embeds (or None)
        layer_params = layer_xs["layers"]  # tuple, one per stream
        aux = jnp.zeros((), jnp.float32)  # per-layer MoE load-balance loss
        new_embeds = []
        q_list, k_list, v_list = [], [], []
        gates1 = []
        for s, lp, x in zip(streams, layer_params, xs_embeds):
            if x is None:
                q_list.append(None)
                gates1.append(None)
                continue
            h, gate1 = _apply_norm(lp["ln1"], s.cfg, x, s.cond)
            gates1.append(gate1)
            bsz, slen, _ = h.shape
            q = core.linear(lp["attn"]["q"], h).reshape(bsz, slen, s.cfg.num_heads, s.cfg.head_dim)
            k = core.linear(lp["attn"]["k"], h).reshape(bsz, slen, s.cfg.num_kv_heads, s.cfg.head_dim)
            v = core.linear(lp["attn"]["v"], h).reshape(bsz, slen, s.cfg.num_kv_heads, s.cfg.head_dim)
            if s.cfg.qk_norm:
                q = rms_norm(q, lp["attn"]["q_norm"]["w"], s.cfg.rms_eps, s.cfg.norm_offset)
                k = rms_norm(k, lp["attn"]["k_norm"]["w"], s.cfg.rms_eps, s.cfg.norm_offset)
            q_list.append(q)
            k_list.append(k)
            v_list.append(v)

        q_cat = jnp.concatenate([q for q in q_list if q is not None], axis=1)
        k_cat = jnp.concatenate(k_list, axis=1)
        v_cat = jnp.concatenate(v_list, axis=1)
        q_cat = apply_rope(q_cat, cos, sin)
        k_cat = apply_rope(k_cat, cos, sin)

        if cache is not None:
            ck, cv = layer_xs["cache_k"], layer_xs["cache_v"]
            if update_cache and write_cols is not None:
                ck = ck.at[row_ix, col_ix].set(k_cat.astype(ck.dtype))
                cv = cv.at[row_ix, col_ix].set(v_cat.astype(cv.dtype))
                k_full, v_full = ck, cv
            elif update_cache:
                ck = jax.lax.dynamic_update_slice(ck, k_cat.astype(ck.dtype), (0, start, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v_cat.astype(cv.dtype), (0, start, 0, 0))
                k_full, v_full = ck, cv
            else:
                k_full = jnp.concatenate([ck, k_cat.astype(ck.dtype)], axis=1)
                v_full = jnp.concatenate([cv, v_cat.astype(cv.dtype)], axis=1)
            new_cache_kv = (ck, cv)
        else:
            k_full, v_full = k_cat, v_cat
            new_cache_kv = (jnp.zeros((), compute_dtype),) * 2  # dummy

        attn_out = _attention(
            q_cat,
            k_full.astype(q_cat.dtype),
            v_full.astype(q_cat.dtype),
            q_grp,
            kv_grp,
            kv_valid,
            scale=scale,
            impl=base.attn_impl,
            q_seg=q_seg_arr,
            kv_seg=kv_seg,
        )

        offset = 0
        for i, (s, lp, x) in enumerate(zip(streams, layer_params, xs_embeds)):
            if x is None:
                new_embeds.append(None)
                continue
            slen = seq_lens[i]
            a = attn_out[:, offset : offset + slen]
            offset += slen
            a = core.linear(lp["attn"]["o"], a.reshape(B, slen, -1))
            x1 = _gated_residual(x, a, gates1[i])
            h2, gate2 = _apply_norm(lp["ln2"], s.cfg, x1, s.cond)
            if s.cfg.moe_num_experts:
                m, moe_aux = moe.moe_mlp(
                    lp["mlp"],
                    h2,
                    top_k=s.cfg.moe_top_k,
                    act=s.cfg.act,
                    capacity_factor=s.cfg.moe_capacity_factor,
                    valid=q_valid[:, offset - slen : offset],
                )
                aux = aux + moe_aux
            else:
                m = core.gated_mlp(lp["mlp"], h2, act=s.cfg.act)
            new_embeds.append(_gated_residual(x1, m, gate2))

        return tuple(new_embeds), (new_cache_kv, aux)

    if remat == "dots":
        # selective remat: keep every matmul output of the layer forward,
        # recompute only the cheap elementwise/norm chain on backward —
        # near-zero recompute FLOPs at a fraction of full-save memory.
        # Right when the model fits with it; `True` stays the memory-
        # tightest choice (4k packed, 7b-class, RL updates).
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_saveable)
    elif remat:
        body = jax.checkpoint(body)

    layer_xs = {"layers": tuple(s.params["layers"] for s in streams)}
    if cache is not None:
        layer_xs["cache_k"] = cache["k"]
        layer_xs["cache_v"] = cache["v"]

    init_carry = tuple(s.embeds for s in streams)
    final_embeds, (cache_kv, aux_layers) = jax.lax.scan(body, init_carry, layer_xs)

    outs = []
    for s, x in zip(streams, final_embeds):
        if x is None:
            outs.append(None)
        else:
            normed, _ = _apply_norm(s.params["norm"], s.cfg, x, s.cond)
            outs.append(normed)

    new_cache = None
    if cache is not None:
        new_cache = dict(cache)
        if update_cache:
            new_cache["k"], new_cache["v"] = cache_kv
            new_cache["grp"], new_cache["valid"] = kv_grp, kv_valid
            new_cache["seg"] = kv_seg
            if write_cols is None:
                new_cache["length"] = (
                    cache["length"] + T if start is not None else jnp.asarray(T, jnp.int32)
                )
    if want_aux:
        return outs, new_cache, {"moe_aux": jnp.sum(aux_layers)}
    return outs, new_cache


def transformer_forward(
    cfg: TransformerConfig,
    params,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    grp: jnp.ndarray,
    valid: jnp.ndarray,
    cache: Optional[dict] = None,
    update_cache: bool = False,
    remat: bool = False,
    q_seg: Optional[jnp.ndarray] = None,
    want_aux: bool = False,
):
    """Single-stream decoder forward (the N=1 MoT special case).

    With ``want_aux=True`` returns (out, cache, {"moe_aux": scalar}) so MoE
    configs trained through single-stream loss paths can add the
    load-balance loss; without it, a MoE config would silently train its
    router with no balance term (expert-collapse risk).
    """
    res = mot_forward(
        [Stream(cfg, params, embeds)],
        positions=positions,
        q_grp=grp,
        q_valid=valid,
        cache=cache,
        update_cache=update_cache,
        remat=remat,
        q_seg=q_seg,
        want_aux=want_aux,
    )
    if want_aux:
        outs, cache, aux = res
        return outs[0], cache, aux
    outs, cache = res
    return outs[0], cache
