"""Pipeline parallelism (GPipe schedule) over a 'stage' mesh axis.

Beyond-reference capability (the reference has no PP — SURVEY.md §2.8 —
because DeepSpeed DP/ZeRO covers its ≤7B models on 8×A100): on TPU pods,
pipelining the decoder stack over ICI neighbors composes with data
parallelism for models whose weights exceed a chip, without the all-gather
traffic of pure FSDP.

TPU-native formulation: layers are already vmap-stacked ``[L, ...]`` pytrees
(nn/transformer.py), so a stage simply owns a contiguous ``L/S`` slice of the
leading layer axis (``in_specs=P('stage')``).  Inside ``shard_map``, a
``lax.scan`` over ``n_micro + S - 1`` GPipe ticks runs the local layer slice
on the current microbatch and hands activations to the next stage with a
single ``lax.ppermute`` ring hop per tick.  Reverse-mode AD through the scan
+ ppermute yields the GPipe backward schedule automatically — no hand-written
backward pipeline.

Composes with data parallelism: batch stays sharded over 'data' while
activations ring over 'stage' (each ppermute moves only the local batch
shard).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dexbotic_tpu.nn import core
from dexbotic_tpu.nn.transformer import (
    TransformerConfig,
    _apply_norm,
    _gated_residual,
    embed_tokens,
    lm_logits,
)
from dexbotic_tpu.ops.attention import attention as _attention
from dexbotic_tpu.ops.norms import rms_norm
from dexbotic_tpu.ops.rope import apply_rope, rope_cos_sin


def decoder_layer(cfg: TransformerConfig, lp, x, cos, sin, grp, valid, seg):
    """One pre-norm decoder layer == one step of mot_forward's single-stream
    scan body (nn/transformer.py:267-338, no-cache path); equality is pinned
    by tests/test_pipeline.py."""
    h, gate1 = _apply_norm(lp["ln1"], cfg, x, None)
    B, T, _ = h.shape
    q = core.linear(lp["attn"]["q"], h).reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = core.linear(lp["attn"]["k"], h).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = core.linear(lp["attn"]["v"], h).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = rms_norm(q, lp["attn"]["q_norm"]["w"], cfg.rms_eps, cfg.norm_offset)
        k = rms_norm(k, lp["attn"]["k_norm"]["w"], cfg.rms_eps, cfg.norm_offset)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    scale = cfg.attn_scale if cfg.attn_scale is not None else cfg.head_dim**-0.5
    a = _attention(
        q, k, v, grp, grp, valid, scale=scale, impl=cfg.attn_impl,
        q_seg=seg, kv_seg=seg,
    )
    a = core.linear(lp["attn"]["o"], a.reshape(B, T, -1))
    x1 = _gated_residual(x, a, gate1)
    h2, gate2 = _apply_norm(lp["ln2"], cfg, x1, None)
    m = core.gated_mlp(lp["mlp"], h2, act=cfg.act)
    return _gated_residual(x1, m, gate2)


def _gpipe_stage(layer_fn, local_layers, x, ctx, n_micro: int, stage_axis: str):
    """Runs inside shard_map: GPipe schedule for one stage.

    ``x``: PYTREE of [B, ...] activations (local batch shard) — a single
    array for one decoder stream, a tuple for MoT streams (pi0/DM0 prefix +
    suffix activations ring together).  ``ctx``: pytree of per-sample arrays
    with leading batch axis (rope cos/sin, masks) — microbatched alongside
    ``x``.  ``layer_fn(x_mb, ctx_mb, lp) -> x_mb`` (same pytree structure).

    The per-tick ``lax.ppermute`` is lowered by XLA to async
    collective-permute-start/done pairs, so the ICI hop overlaps with any
    schedulable compute; activations per hop are one microbatch, which on
    ICI is far below the per-tick layer-slice compute time.
    """
    S = jax.lax.psum(1, stage_axis)
    idx = jax.lax.axis_index(stage_axis)
    leaves = jax.tree.leaves(x)
    B = leaves[0].shape[0]
    assert B % n_micro == 0, f"batch {B} not divisible by n_micro {n_micro}"
    mb = B // n_micro
    split = lambda a: a.reshape(n_micro, mb, *a.shape[1:])
    mbs = jax.tree.map(split, x)
    ctx_mbs = jax.tree.map(split, ctx)

    def run_local(x_mb, ctx_mb):
        def body(c, lp):
            return layer_fn(c, ctx_mb, lp), None

        return jax.lax.scan(body, x_mb, local_layers)[0]

    def _index(tree, i):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), tree
        )

    def tick(carry, t):
        state, outputs = carry
        t_in = jnp.clip(t, 0, n_micro - 1)
        inject = _index(mbs, t_in)
        x_mb = jax.tree.map(
            lambda a, b: jnp.where(idx == 0, a, b), inject, state
        )
        # every stage processes microbatch (t - idx); clamp so bubble ticks
        # still see a valid ctx slice (their results are discarded)
        m_here = jnp.clip(t - idx, 0, n_micro - 1)
        ctx_mb = _index(ctx_mbs, m_here)
        y = run_local(x_mb, ctx_mb)
        m_out = t - (S - 1)
        mc = jnp.clip(m_out, 0, n_micro - 1)
        cur = _index(outputs, mc)
        upd = jax.tree.map(
            lambda yy, cc: jnp.where((idx == S - 1) & (m_out >= 0), yy, cc), y, cur
        )
        outputs = jax.tree.map(
            lambda o, u: jax.lax.dynamic_update_index_in_dim(o, u, mc, 0),
            outputs, upd,
        )
        state = jax.tree.map(
            lambda yy: jax.lax.ppermute(
                yy, stage_axis, [(i, (i + 1) % S) for i in range(S)]
            ),
            y,
        )
        return (state, outputs), None

    n_ticks = n_micro + S - 1
    init = (_index(jax.tree.map(jnp.zeros_like, mbs), 0),
            jax.tree.map(jnp.zeros_like, mbs))
    (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
    # only the last stage holds real outputs; replicate over the ring
    outputs = jax.tree.map(
        lambda o: jax.lax.psum(
            jnp.where(idx == S - 1, o, jnp.zeros_like(o)), stage_axis
        ),
        outputs,
    )
    return jax.tree.map(
        lambda o, orig: o.reshape(orig.shape), outputs, x
    )


def mot_decoder_layer(cfgs, lps, xs, cos, sin, grp, valid, seg, conds):
    """One MoT layer over N streams (pi0/DM0 prefix + action-expert suffix):
    per-stream QKV with each stream's weights, ONE joint attention over the
    sequence concatenation, per-stream o-proj/MLP/residuals — the PP mirror
    of mot_forward's multi-stream scan body (nn/transformer.py:266-338,
    no-cache path), adaRMS conds included.  ``cos/sin/grp/valid/seg`` span
    the CONCATENATED sequence."""
    base = cfgs[0]
    scale = base.attn_scale if base.attn_scale is not None else base.head_dim**-0.5
    q_list, k_list, v_list, gates1, hs = [], [], [], [], []
    for cfg, lp, x, cond in zip(cfgs, lps, xs, conds):
        h, gate1 = _apply_norm(lp["ln1"], cfg, x, cond)
        gates1.append(gate1)
        B, T, _ = h.shape
        q = core.linear(lp["attn"]["q"], h).reshape(B, T, cfg.num_heads, cfg.head_dim)
        k = core.linear(lp["attn"]["k"], h).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = core.linear(lp["attn"]["v"], h).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, lp["attn"]["q_norm"]["w"], cfg.rms_eps, cfg.norm_offset)
            k = rms_norm(k, lp["attn"]["k_norm"]["w"], cfg.rms_eps, cfg.norm_offset)
        q_list.append(q)
        k_list.append(k)
        v_list.append(v)

    q_cat = apply_rope(jnp.concatenate(q_list, axis=1), cos, sin)
    k_cat = apply_rope(jnp.concatenate(k_list, axis=1), cos, sin)
    v_cat = jnp.concatenate(v_list, axis=1)
    a_cat = _attention(
        q_cat, k_cat, v_cat, grp, grp, valid, scale=scale, impl=base.attn_impl,
        q_seg=seg, kv_seg=seg,
    )
    outs, offset = [], 0
    for cfg, lp, x, cond, gate1 in zip(cfgs, lps, xs, conds, gates1):
        B, T, _ = x.shape
        a = a_cat[:, offset : offset + T]
        offset += T
        a = core.linear(lp["attn"]["o"], a.reshape(B, T, -1))
        x1 = _gated_residual(x, a, gate1)
        h2, gate2 = _apply_norm(lp["ln2"], cfg, x1, cond)
        m = core.gated_mlp(lp["mlp"], h2, act=cfg.act)
        outs.append(_gated_residual(x1, m, gate2))
    return tuple(outs)


def pipeline_mot_forward(
    cfgs,  # sequence of TransformerConfig, one per stream
    stream_params,  # sequence of param trees ({'layers', 'norm'})
    embeds,  # sequence of [B, T_i, H_i] activations
    positions: jnp.ndarray,  # int[B, sum T_i]
    grp: jnp.ndarray,
    valid: jnp.ndarray,
    mesh: Mesh,
    n_micro: int = 4,
    conds=None,  # per-stream adaRMS cond [B, D] or None
    seg: Optional[jnp.ndarray] = None,
    stage_axis: str = "stage",
    data_axis: Optional[str] = "data",
):
    """MoT (pi0/pi0.5/DM0 two-tree) forward, GPipe-pipelined over
    ``mesh[stage_axis]``: each stage owns the SAME contiguous layer range of
    every stream (streams share layer counts, nn/transformer.py:230), and
    the per-stream activations ring between stages together.  Matches
    mot_forward (no-cache path) numerically; returns the per-stream
    final-normed outputs."""
    S = mesh.shape[stage_axis]
    base = cfgs[0]
    for c in cfgs:
        assert c.num_layers == base.num_layers
    assert base.num_layers % S == 0, (
        f"num_layers {base.num_layers} not divisible by {S} stages"
    )
    cos, sin = rope_cos_sin(positions, base.head_dim, base.rope_theta)
    seg_arr = jnp.zeros_like(grp) if seg is None else seg.astype(jnp.int32)
    conds = tuple(conds) if conds is not None else (None,) * len(cfgs)
    ctx = {
        "cos": cos, "sin": sin,
        "grp": grp.astype(jnp.int32),
        "valid": valid.astype(jnp.int32),
        "seg": seg_arr,
        "conds": conds,
    }
    cfgs = tuple(cfgs)

    def layer_fn(x_mb, ctx_mb, lp):
        return mot_decoder_layer(
            cfgs, lp, x_mb, ctx_mb["cos"], ctx_mb["sin"],
            ctx_mb["grp"], ctx_mb["valid"], ctx_mb["seg"], ctx_mb["conds"],
        )

    batch_spec = P(data_axis) if data_axis and data_axis in mesh.shape else P()
    stage_fn = functools.partial(
        _gpipe_stage, layer_fn, n_micro=n_micro, stage_axis=stage_axis
    )
    mapped = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(stage_axis), batch_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    layer_stacks = tuple(p["layers"] for p in stream_params)
    hidden = mapped(layer_stacks, tuple(embeds), ctx)
    outs = []
    for cfg, p, x, cond in zip(cfgs, stream_params, hidden, conds):
        normed, _ = _apply_norm(p["norm"], cfg, x, cond)
        outs.append(normed)
    return outs


def pipeline_flow_vla_loss(
    params, cfg, batch: dict, rng, mesh: Mesh, n_micro: int = 4,
    stage_axis: str = "stage", data_axis: Optional[str] = "data",
):
    """flow_vla_loss (models/flow_vla.py:232-266) with the MoT stack
    pipelined: same embeds/targets, the two-stream forward runs as
    pipeline_mot_forward.  Numerics match the GSPMD loss (test_pipeline)."""
    import jax.numpy as jnp  # noqa: F811 (local clarity)

    from dexbotic_tpu.models.flow_vla import (
        _positions_and_grp, embed_prefix, embed_suffix,
    )

    actions = batch["actions"].astype(jnp.float32)
    B = actions.shape[0]
    k_n, k_t = jax.random.split(rng)
    noise = jax.random.normal(k_n, actions.shape, jnp.float32)
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
    outs = pipeline_mot_forward(
        (cfg.llm, cfg.expert),
        (params["vlm"]["llm"], params["expert"]),
        (prefix_tokens, suffix_tokens),
        positions, grp, mask, mesh, n_micro=n_micro,
        conds=(None, cond) if cfg.adarms else None,
        stage_axis=stage_axis, data_axis=data_axis,
    )
    v_t = core.linear(params["action_out_proj"], outs[1][:, -cfg.chunk_size :])
    loss = jnp.mean(jnp.square(v_t.astype(jnp.float32) - u_t))
    return loss, {"action_loss": loss, "loss": loss}


def pipeline_transformer_forward(
    cfg: TransformerConfig,
    params,
    embeds: jnp.ndarray,  # [B, T, H]
    positions: jnp.ndarray,  # int[B, T]
    grp: jnp.ndarray,  # int[B, T] attention groups (ops/masks.py)
    valid: jnp.ndarray,
    mesh: Mesh,
    n_micro: int = 4,
    seg: Optional[jnp.ndarray] = None,
    stage_axis: str = "stage",
    data_axis: Optional[str] = "data",
):
    """Decoder stack forward, GPipe-pipelined over ``mesh[stage_axis]``.

    Matches ``transformer_forward`` (no-cache path) numerically; layers are
    split contiguously over stages, batch optionally sharded over
    ``data_axis``.  Returns final-normed hidden states [B, T, H].
    """
    S = mesh.shape[stage_axis]
    assert cfg.num_layers % S == 0, (
        f"num_layers {cfg.num_layers} not divisible by {S} stages"
    )
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    seg_arr = jnp.zeros_like(grp) if seg is None else seg.astype(jnp.int32)
    ctx = {
        "cos": cos, "sin": sin,
        "grp": grp.astype(jnp.int32),
        "valid": valid.astype(jnp.int32),
        "seg": seg_arr,
    }

    def layer_fn(x_mb, ctx_mb, lp):
        return decoder_layer(
            cfg, lp, x_mb, ctx_mb["cos"], ctx_mb["sin"],
            ctx_mb["grp"], ctx_mb["valid"], ctx_mb["seg"],
        )

    batch_spec = P(data_axis) if data_axis and data_axis in mesh.shape else P()
    stage_fn = functools.partial(
        _gpipe_stage, layer_fn, n_micro=n_micro, stage_axis=stage_axis
    )
    mapped = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(stage_axis), batch_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    hidden = mapped(params["layers"], embeds, ctx)
    normed, _ = _apply_norm(params["norm"], cfg, hidden, None)
    return normed


def pipeline_causal_lm_loss(
    params,
    cfg: TransformerConfig,
    batch: dict,  # input_ids [B,T], attention_mask [B,T], labels [B,T]
    mesh: Mesh,
    n_micro: int = 4,
    stage_axis: str = "stage",
    data_axis: Optional[str] = "data",
):
    """Causal-LM loss with the decoder stack pipelined (embed/lm_head stay in
    GSPMD-land; ignore-index -100 labels masked out, fp32 CE)."""
    ids = batch["input_ids"]
    valid = batch["attention_mask"].astype(jnp.int32)
    B, T = ids.shape
    positions = jnp.cumsum(valid, axis=1) - 1
    grp = positions * valid  # strictly causal groups among valid tokens
    x = embed_tokens(params, cfg, ids, dtype=jnp.bfloat16)
    hidden = pipeline_transformer_forward(
        cfg, params, x, positions, grp, valid, mesh,
        n_micro=n_micro, stage_axis=stage_axis, data_axis=data_axis,
    )
    logits = lm_logits(params, cfg, hidden[:, :-1]).astype(jnp.float32)
    labels = batch["labels"][:, 1:]
    mask = (labels != -100) & (valid[:, 1:] == 1)
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def pp_param_shardings(params, cfg: TransformerConfig, mesh: Mesh,
                       stage_axis: str = "stage"):
    """At-rest shardings for a decoder param tree under PP: stacked layer
    leaves split over the stage axis, everything else replicated."""

    def spec_for(path, x):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys and keys[0] == "layers" and x.ndim >= 1 and x.shape[0] == cfg.num_layers:
            return NamedSharding(mesh, P(stage_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
