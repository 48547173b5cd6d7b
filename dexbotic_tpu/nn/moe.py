"""Mixture-of-Experts FFN with capacity-based dispatch (expert parallelism).

Beyond the reference (dexbotic's backbones are all dense): a GShard/Switch
style MoE layer in the canonical TPU/GSPMD formulation — top-k routing,
STATIC per-expert capacity, one-hot dispatch/combine einsums, and expert
weights stacked on a leading [num_experts] axis so the 'expert' mesh axis
shards them at rest (parallel/mesh.py EP rules).  Everything is static-shape
and einsum-only: XLA turns the dispatch/combine contractions into the
all-to-all pattern over ICI, and the per-expert FFN is one batched matmul on
the MXU.  No gather/scatter, no ragged shapes, no host control flow.

Enabled per-stream via TransformerConfig.moe_num_experts; the load-balancing
auxiliary loss (Switch Transformers eq. 4) is accumulated across layers and
surfaced by mot_forward(want_aux=True).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dexbotic_tpu.nn import core


def moe_init(key, hidden: int, intermediate: int, num_experts: int, dtype=jnp.float32):
    """Router + expert-stacked gated-MLP weights.

    Expert kernels are [num_experts, in, out] — the same trailing ("mlp",
    <name>, "w") paths as the dense gated MLP, so the megatron TP rules
    (parallel/mesh.py:TP_RULES) apply unchanged (the shift-by-ndim logic
    lands on the same in/out dims) and the EP rule shards the leading
    expert axis.  The router stays fp32 and replicated: its output decides
    control flow and is tiny.
    """
    kr, kg, ku, kd = jax.random.split(key, 4)

    def stack(k, in_dim, out_dim):
        keys = jax.random.split(k, num_experts)
        init = core.torch_linear_init()
        return jax.vmap(lambda kk: init(kk, (in_dim, out_dim), dtype))(keys)

    return {
        "router": {"w": core.normal_init(0.02)(kr, (hidden, num_experts), jnp.float32)},
        "gate": {"w": stack(kg, hidden, intermediate)},
        "up": {"w": stack(ku, hidden, intermediate)},
        "down": {"w": stack(kd, intermediate, hidden)},
    }


def expert_capacity(num_tokens: int, num_experts: int, top_k: int, capacity_factor: float) -> int:
    """Static per-expert slot count (python int — shapes must be static)."""
    return max(top_k, int(math.ceil(capacity_factor * top_k * num_tokens / num_experts)))


def moe_mlp(
    p,
    x: jnp.ndarray,  # [B, T, H]
    *,
    top_k: int = 2,
    act: str = "silu",
    capacity_factor: float = 2.0,
    valid: jnp.ndarray = None,  # optional bool/int [B, T]; invalid tokens are not routed
):
    """Returns (y [B,T,H], aux load-balance loss scalar fp32).

    Dispatch is first-come-first-served in (slot, token) order: every
    token's best expert is placed before any token's second-best, so under
    capacity pressure it is second choices that drop (their combine weight
    is zeroed; the token keeps its other experts' contributions).

    ``valid`` masks padding: invalid tokens neither occupy capacity slots
    (they can't evict real tokens' second choices) nor enter the f/P
    load-balance statistics, and their output is zero.

    Memory note: the dispatch tensor is [N, E, C] with C ≈
    capacity_factor·top_k·N/E, i.e. O(N²/E) per layer — e.g. E=4, N=4096
    is ~268 MB fp32.  Fine at VLA sequence lengths/dryrun scale; for
    small-E long-sequence configs prefer a gather-based path.  (Only ONE
    [N,E,C] tensor is built; combine weights ride a cheap [N,E] factor.)
    """
    B, T, H = x.shape
    E = p["router"]["w"].shape[-1]
    N = B * T
    C = expert_capacity(N, E, top_k, capacity_factor)
    xf = x.reshape(N, H)
    vf = None if valid is None else valid.reshape(N).astype(jnp.float32)  # [N]

    # Routing in fp32: softmax over experts, renormalized top-k weights.
    logits = xf.astype(jnp.float32) @ p["router"]["w"].astype(jnp.float32)  # [N, E]
    probs = jax.nn.softmax(logits, axis=-1)
    w_topk, expert_ix = jax.lax.top_k(probs, top_k)  # [N, k]
    w_topk = w_topk / jnp.sum(w_topk, axis=-1, keepdims=True)
    if vf is not None:
        w_topk = w_topk * vf[:, None]

    # Per-assignment position inside its expert's capacity buffer.  Invalid
    # tokens are excluded from the one-hots so they never consume a slot.
    oh = jax.nn.one_hot(expert_ix, E, dtype=jnp.int32)  # [N, k, E]
    if vf is not None:
        oh = oh * vf[:, None, None].astype(jnp.int32)
    ohk = jnp.transpose(oh, (1, 0, 2))  # [k, N, E] — slot-major priority
    flat = ohk.reshape(top_k * N, E)
    pos_flat = jnp.cumsum(flat, axis=0) - flat  # index of this assignment within its expert
    pos = pos_flat.reshape(top_k, N, E)
    pos_in_expert = jnp.sum(pos * ohk, axis=-1)  # [k, N]
    keep = (pos_in_expert < C).astype(jnp.float32)  # overflow assignments drop

    pos_oh = jax.nn.one_hot(pos_in_expert, C, dtype=jnp.float32)  # [k, N, C]
    ohf = ohk.astype(jnp.float32)
    wt = jnp.transpose(w_topk, (1, 0)) * keep  # [k, N]
    dispatch = jnp.einsum("kn,kne,knc->nec", keep, ohf, pos_oh)  # 0/1 mask
    # Each token reaches each expert at most once (top-k indices are
    # distinct), so the combine tensor factors as dispatch * W[n,e]: no
    # second [N,E,C] materialization.
    w_ne = jnp.einsum("kn,kne->ne", wt, ohf)  # [N, E]

    # Expert FFN: [E, C, H] batched gated MLP — one MXU matmul per weight.
    xs = jnp.einsum("nh,nec->ech", xf, dispatch.astype(xf.dtype))
    g = jnp.einsum("ech,ehi->eci", xs, p["gate"]["w"].astype(xs.dtype))
    u = jnp.einsum("ech,ehi->eci", xs, p["up"]["w"].astype(xs.dtype))
    h = core.ACTIVATIONS[act](g) * u
    ys = jnp.einsum("eci,eih->ech", h, p["down"]["w"].astype(h.dtype))
    y = jnp.einsum("ech,nec,ne->nh", ys, dispatch.astype(ys.dtype), w_ne.astype(ys.dtype))

    # Switch load-balance loss: E * sum_e f_e * P_e  (uniform router -> 1.0).
    # f/P are means over VALID tokens only.
    top1 = jax.nn.one_hot(expert_ix[:, 0], E, dtype=jnp.float32)
    if vf is None:
        f = jnp.mean(top1, axis=0)  # fraction of tokens whose argmax is e
        P = jnp.mean(probs, axis=0)  # mean router probability of e
    else:
        denom = jnp.maximum(jnp.sum(vf), 1.0)
        f = jnp.sum(top1 * vf[:, None], axis=0) / denom
        P = jnp.sum(probs * vf[:, None], axis=0) / denom
    aux = jnp.asarray(E, jnp.float32) * jnp.sum(f * P)

    return y.reshape(B, T, H), aux
