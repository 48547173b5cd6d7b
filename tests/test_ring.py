"""Ring attention (parallel/ring.py) on the 8-device virtual mesh.

Context parallelism: the sequence axis is sharded over a 'seq' mesh axis
and attention runs as a ppermute ring of kv blocks.  Verifies the ring
matches attention_xla (forward AND gradients through reverse-AD of the
ring schedule), honors the group-int/valid/segment mask semantics, and
trains a sequence-sharded decoder via `attn_impl="ring:seq"` with the loss
and grads matching the single-device path.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from dexbotic_tpu.nn.transformer import (
    TransformerConfig,
    embed_tokens,
    init_transformer,
    transformer_forward,
)
from dexbotic_tpu.ops.attention import attention_xla
from dexbotic_tpu.parallel.ring import ring_attention


def _mesh(seq: int, data: int = 1) -> Mesh:
    devs = np.asarray(jax.devices()[: seq * data]).reshape(data, seq)
    return Mesh(devs, ("data", "seq"))


def _attn_inputs(B=2, S=64, Hq=4, Hkv=2, D=16, seed=0, packed=True):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, S, Hq, D), jnp.float32)
    k = jnp.asarray(r.randn(B, S, Hkv, D), jnp.float32)
    v = jnp.asarray(r.randn(B, S, Hkv, D), jnp.float32)
    grp = jnp.broadcast_to(jnp.arange(1, S + 1, dtype=jnp.int32), (B, S))
    valid = jnp.asarray(r.rand(B, S) > 0.1, jnp.int32)
    if packed:  # two packed segments per row, NaVILA-style
        seg = (jnp.arange(S)[None, :] >= r.randint(S // 4, 3 * S // 4, (B, 1))
               ).astype(jnp.int32)
    else:
        seg = jnp.zeros((B, S), jnp.int32)
    return q, k, v, grp, valid, seg


def _ring_call(mesh, q, k, v, q_grp, kv_grp, kv_valid, q_seg, kv_seg):
    spec3 = P(None, "seq", None, None)
    spec2 = P(None, "seq")

    def f(q, k, v, q_grp, kv_grp, kv_valid, q_seg, kv_seg):
        return ring_attention(q, k, v, q_grp, kv_grp, kv_valid,
                              axis_name="seq", q_seg=q_seg, kv_seg=kv_seg)

    fm = shard_map(
        f, mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec2, spec2, spec2, spec2, spec2),
        out_specs=spec3,
    )
    return jax.jit(fm)(q, k, v, q_grp, kv_grp, kv_valid, q_seg, kv_seg)


def test_ring_matches_xla_forward():
    q, k, v, grp, valid, seg = _attn_inputs()
    ref = attention_xla(q, k, v, grp, grp, valid, q_seg=seg, kv_seg=seg)
    for n_seq in (2, 4, 8):
        out = _ring_call(_mesh(n_seq), q, k, v, grp, grp, valid,
                         q_seg=seg, kv_seg=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_ring_gqa_and_no_segments():
    q, k, v, grp, valid, _ = _attn_inputs(Hq=8, Hkv=2, packed=False)
    ref = attention_xla(q, k, v, grp, grp, valid)
    out = _ring_call(_mesh(4), q, k, v, grp, grp, valid,
                     q_seg=jnp.zeros_like(grp), kv_seg=jnp.zeros_like(grp))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_grads_match_xla():
    q, k, v, grp, valid, seg = _attn_inputs(seed=3)
    mesh = _mesh(4)

    def loss_ring(q, k, v):
        out = _ring_call(mesh, q, k, v, grp, grp, valid, q_seg=seg, kv_seg=seg)
        return jnp.sum(jnp.sin(out) * 0.01)

    def loss_xla(q, k, v):
        out = attention_xla(q, k, v, grp, grp, valid, q_seg=seg, kv_seg=seg)
        return jnp.sum(jnp.sin(out) * 0.01)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_ring, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


CFG = TransformerConfig(
    vocab_size=128, hidden_size=64, num_layers=3, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, attn_impl="xla",
)


def _lm_inputs(B=4, S=32, seed=1):
    r = np.random.RandomState(seed)
    ids = jnp.asarray(r.randint(1, 120, (B, S)))
    valid = jnp.ones((B, S), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)
    grp = jnp.cumsum(valid, axis=1)
    # packed: two segments per row
    seg = (jnp.arange(S)[None, :] >= S // 2).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)
    target = jnp.asarray(r.randn(B, S, CFG.hidden_size), jnp.float32)
    return ids, valid, positions, grp, seg, target


def test_ring_decoder_train_step_matches_single_device():
    """attn_impl='ring:seq' under shard_map == attn_impl='xla' single-device:
    the context-parallel packed-training pattern (loss + param grads)."""
    params = init_transformer(jax.random.PRNGKey(0), CFG)
    ids, valid, positions, grp, seg, target = _lm_inputs()
    cfg_ring = dataclasses.replace(CFG, attn_impl="ring:seq")
    mesh = _mesh(seq=4, data=2)

    def local_loss(cfg):
        def f(params, ids, positions, grp, valid, seg, target):
            x = embed_tokens(params, cfg, ids)
            out, _ = transformer_forward(cfg, params, x, positions, grp, valid,
                                         q_seg=seg)
            return jnp.mean((out - target) ** 2)
        return f

    ref_loss_fn = local_loss(CFG)
    ref, g_ref = jax.jit(jax.value_and_grad(ref_loss_fn))(
        params, ids, positions, grp, valid, seg, target)

    def cp_f(params, ids, positions, grp, valid, seg, target):
        l = local_loss(cfg_ring)(params, ids, positions, grp, valid, seg, target)
        return jax.lax.pmean(jax.lax.pmean(l, "seq"), "data")

    s2 = P("data", "seq")
    s3 = P("data", "seq", None)
    cp_loss = jax.jit(shard_map(
        cp_f, mesh=mesh,
        in_specs=(P(), s2, s2, s2, s2, s2, s3), out_specs=P()))
    got = cp_loss(params, ids, positions, grp, valid, seg, target)
    np.testing.assert_allclose(float(got), float(ref), atol=1e-6, rtol=1e-6)

    g_cp = jax.jit(jax.grad(
        lambda p: cp_loss(p, ids, positions, grp, valid, seg, target)))(params)
    flat_cp = {jax.tree_util.keystr(p): l
               for p, l in jax.tree_util.tree_flatten_with_path(g_cp)[0]}
    for path, leaf in jax.tree_util.tree_flatten_with_path(g_ref)[0]:
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(flat_cp[name]), np.asarray(leaf),
                                   atol=5e-5, rtol=5e-4, err_msg=name)
