"""DiT action head (CogACT / MemVLA style).

Condition token = timestep embedding + projected cognition feature,
prepended to embedded noisy actions; plain pre-LN transformer blocks;
zero-initialized final layer.  Behavior pinned to
/root/reference/dexbotic/model/cogact/action_model/dit.py.
MemVLA's variant adds zero-init cross-attention to memory tokens per block
(memvla/action_model/dit.py:121-175) — enabled via `mem_cross_attn`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.nn import core
from dexbotic_tpu.ops.attention import attention_xla
from dexbotic_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    in_channels: int = 7  # action dim
    token_size: int = 4096  # cognition-feature dim
    chunk_size: int = 16
    class_dropout_prob: float = 0.1
    freq_embed_size: int = 256
    mem_cross_attn: bool = False  # MemVLA memory-conditioned variant
    # lax.scan unroll factor for the block stack: at B=1 the DiT is
    # launch-bound (µs-scale fusions), so unrolling removes while-loop
    # per-iteration overhead at some compile-time cost
    scan_unroll: int = 1

    @property
    def seq_len(self) -> int:
        return self.chunk_size + 1  # cond token + actions

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# Size presets (action_models.py:48-61).
DIT_SIZES = {
    "DiT-S": dict(depth=6, hidden_size=384, num_heads=4),
    "DiT-B": dict(depth=12, hidden_size=768, num_heads=12),
    "DiT-L": dict(depth=24, hidden_size=1024, num_heads=16),
}


def make_dit_config(model_type: str, token_size: int, action_dim: int, chunk_size: int, **kw) -> DiTConfig:
    return DiTConfig(
        token_size=token_size, in_channels=action_dim, chunk_size=chunk_size,
        **DIT_SIZES[model_type], **kw,
    )


def _block_init(key, cfg: DiTConfig, dtype):
    ks = jax.random.split(key, 8)
    h = cfg.hidden_size
    xavier = core.xavier_uniform_init()
    p = {
        "attn": {
            "qkv": core.linear_init(ks[0], h, 3 * h, True, dtype, w_init=xavier, b_init=core.zeros_init()),
            "o": core.linear_init(ks[1], h, h, True, dtype, w_init=xavier, b_init=core.zeros_init()),
        },
        "mlp": {
            "fc0": core.linear_init(ks[2], h, int(h * cfg.mlp_ratio), True, dtype, w_init=xavier, b_init=core.zeros_init()),
            "fc1": core.linear_init(ks[3], int(h * cfg.mlp_ratio), h, True, dtype, w_init=xavier, b_init=core.zeros_init()),
        },
    }
    if cfg.mem_cross_attn:
        # zero-init output proj so the module starts as identity; norm3 is an
        # AFFINE LayerNorm in the reference (memvla/action_model/dit.py:175)
        p["xattn"] = {
            "q": core.linear_init(ks[4], h, h, True, dtype, w_init=xavier, b_init=core.zeros_init()),
            "k": core.linear_init(ks[5], h, h, True, dtype, w_init=xavier, b_init=core.zeros_init()),
            "v": core.linear_init(ks[6], h, h, True, dtype, w_init=xavier, b_init=core.zeros_init()),
            "o": core.linear_init(ks[7], h, h, True, dtype, w_init=core.zeros_init(), b_init=core.zeros_init()),
            "ln": {"w": jnp.ones((h,), jnp.float32), "b": jnp.zeros((h,), jnp.float32)},
        }
    return p


def init_dit(key, cfg: DiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    h = cfg.hidden_size
    params = {
        "x_embed": core.linear_init(ks[0], cfg.in_channels, h, True, dtype, w_init=core.normal_init(0.02), b_init=core.zeros_init()),
        "t_mlp": {
            "fc0": core.linear_init(ks[1], cfg.freq_embed_size, h, True, dtype, w_init=core.normal_init(0.02), b_init=core.zeros_init()),
            "fc1": core.linear_init(ks[2], h, h, True, dtype, w_init=core.normal_init(0.02), b_init=core.zeros_init()),
        },
        "z_embed": core.linear_init(ks[3], cfg.token_size, h, True, dtype, w_init=core.normal_init(0.02), b_init=core.zeros_init()),
        "pos_embed": core.normal_init(h**-0.5)(ks[4], (cfg.seq_len, h), dtype),
        "blocks": jax.vmap(lambda k: _block_init(k, cfg, dtype))(jax.random.split(ks[5], cfg.depth)),
        "final": core.linear_init(ks[6], h, cfg.in_channels, True, dtype, w_init=core.zeros_init(), b_init=core.zeros_init()),
    }
    if cfg.class_dropout_prob > 0:
        params["uncondition"] = core.normal_init(0.02)(ks[7], (cfg.token_size,), dtype)
    return params


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """[cos, sin] sinusoidal embedding of int/float timesteps (dit.py:36-57)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def dit_forward(
    params,
    cfg: DiTConfig,
    x: jnp.ndarray,  # [B, T, action_dim] noisy actions
    t: jnp.ndarray,  # [B] timesteps
    z: jnp.ndarray,  # [B, 1, token_size] condition
    mem: Optional[jnp.ndarray] = None,  # [B, M, hidden] memory tokens (MemVLA)
    mem_valid: Optional[jnp.ndarray] = None,  # [B, M]
    drop_rng: Optional[jax.Array] = None,  # train-time CFG condition dropout
) -> jnp.ndarray:
    B = x.shape[0]
    if drop_rng is not None and cfg.class_dropout_prob > 0:
        drop = jax.random.uniform(drop_rng, (B,)) < cfg.class_dropout_prob
        z = jnp.where(drop[:, None, None], params["uncondition"].astype(z.dtype)[None, None, :], z)

    # Compute in the weights' dtype: the sampler keeps x_t/z in fp32 for the
    # scheduler math, but feeding fp32 activations into bf16 weights promotes
    # EVERY matmul to fp32 — a fraction of MXU speed.  Training inits the
    # head fp32 (reference fp32-autocast loss parity) so nothing changes
    # there; bf16 serving params run the whole chain on the bf16 MXU with
    # fp32 norms (ops/norms.py).  Output returns fp32 for the sampler.
    w = params["x_embed"]["w"]
    cdtype = w["s"].dtype if isinstance(w, dict) else w.dtype
    x = x.astype(cdtype)
    z = z.astype(cdtype)
    if mem is not None:
        mem = mem.astype(cdtype)

    xe = core.linear(params["x_embed"], x)  # [B, T, H]
    te = timestep_embedding(t, cfg.freq_embed_size).astype(xe.dtype)
    te = core.linear(params["t_mlp"]["fc1"], jax.nn.silu(core.linear(params["t_mlp"]["fc0"], te)))
    ze = core.linear(params["z_embed"], z)  # [B, 1, H]
    c = te[:, None, :] + ze
    h = jnp.concatenate([c, xe], axis=1) + params["pos_embed"].astype(xe.dtype)[None]

    S = h.shape[1]
    grp = jnp.zeros((B, S), jnp.int32)
    valid = jnp.ones((B, S), jnp.int32)
    if mem is not None:
        M = mem.shape[1]
        mem_grp = jnp.zeros((B, M), jnp.int32)
        if mem_valid is None:
            mem_valid = jnp.ones((B, M), jnp.int32)

    def body(carry, bp):
        hh = carry
        hn = layer_norm(hh, eps=1e-6)
        qkv = core.linear(bp["attn"]["qkv"], hn).reshape(B, S, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = attention_xla(q, k, v, grp, grp, valid)
        hh = hh + core.linear(bp["attn"]["o"], a.reshape(B, S, -1))
        if cfg.mem_cross_attn:
            hn2 = layer_norm(hh, bp["xattn"]["ln"]["w"], bp["xattn"]["ln"]["b"], eps=1e-6)
            q2 = core.linear(bp["xattn"]["q"], hn2).reshape(B, S, cfg.num_heads, cfg.head_dim)
            k2 = core.linear(bp["xattn"]["k"], mem).reshape(B, -1, cfg.num_heads, cfg.head_dim)
            v2 = core.linear(bp["xattn"]["v"], mem).reshape(B, -1, cfg.num_heads, cfg.head_dim)
            a2 = attention_xla(q2, k2, v2, grp, mem_grp, mem_valid)
            hh = hh + core.linear(bp["xattn"]["o"], a2.reshape(B, S, -1))
        hn3 = layer_norm(hh, eps=1e-6)
        m = core.linear(bp["mlp"]["fc1"], jax.nn.gelu(core.linear(bp["mlp"]["fc0"], hn3), approximate=True))
        return hh + m, None

    h, _ = jax.lax.scan(body, h, params["blocks"], unroll=cfg.scan_unroll)
    h = layer_norm(h, eps=1e-6)
    out = core.linear(params["final"], h).astype(jnp.float32)
    return out[:, 1:, :]  # drop cond token


def dit_forward_with_cfg(params, cfg: DiTConfig, x, t, z, cfg_scale: float, **kw):
    """Classifier-free-guided eps: batch is [cond; uncond] halves
    (dit.py:294-311).  x's two halves must be identical noise."""
    half = x.shape[0] // 2
    combined = jnp.concatenate([x[:half], x[:half]], axis=0)
    eps = dit_forward(params, cfg, combined, t, z, **kw)
    cond_eps, uncond_eps = eps[:half], eps[half:]
    guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    return jnp.concatenate([guided, guided], axis=0)
