"""HF torch checkpoint -> dexbotic_tpu param-tree conversion.

Maps reference checkpoints (CogACT LLaVA-style, pi0 PaliGemma+expert, DM0
Qwen3 pair, OFT; SURVEY.md §7 'weight conversion fidelity') onto our layouts:
  * torch Linear [out, in] -> ours [in, out] (transpose)
  * per-layer dicts -> stacked [num_layers, ...] leaves (scan layout)
  * CLIP/SigLIP conv patch embed [H, 3, p, p] -> [p*p*3, H] matmul in
    (row, col, channel) patch order (nn/vit.py patchify)

All functions take a flat state_dict of numpy arrays keyed by HF names
(load with `load_torch_state_dict`).
"""

from __future__ import annotations

import os

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """Load .safetensors / .bin / .pt file(s) or a HF dir -> numpy dict."""
    files = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith((".safetensors", ".bin", ".pt")):
                files.append(os.path.join(path, f))
    else:
        files = [path]
    out = {}
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    out[k] = sf.get_tensor(k)
        else:
            import torch

            sd = torch.load(f, map_location="cpu", weights_only=True)
            for k, v in sd.items():
                out[k] = v.float().numpy() if v.dtype == getattr(torch, "bfloat16") else v.numpy()
    return out


def _strip(sd: dict, prefix: str) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix) :]] = v
    return out


def _lin(sd, name, bias_optional=True):
    p = {"w": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["b"] = np.asarray(sd[f"{name}.bias"])
    return p


def _stack(dicts: list) -> dict:
    """List of per-layer param dicts -> stacked leading-axis pytree."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *dicts)


# ---------------------------------------------------------------------------
# LLM (LLaMA / Qwen2 / Qwen3 / Gemma naming)
# ---------------------------------------------------------------------------


def _norm_params(sd: dict, name: str) -> dict:
    """RMSNorm weight, or pi0.5's adaRMS dense (cond -> scale/shift/gate)
    (/root/reference/dexbotic/model/pi05/transformers_pi05/gemma/
    modeling_gemma.py:38-89: adaptive norms hold a `dense` Linear instead
    of a `weight` vector)."""
    if f"{name}.dense.weight" in sd:
        return {"dense": _lin(sd, f"{name}.dense")}
    return {"w": np.asarray(sd[f"{name}.weight"])}


def convert_llm(sd: dict, cfg, prefix: str = "") -> dict:
    """HF decoder state_dict -> transformer params.  `prefix` example:
    'model.' (bare LlamaModel), 'model.llm.' (dexbotic VLM)."""
    sd = _strip(sd, prefix)
    layers = []
    for i in range(cfg.num_layers):
        lp = {
            "ln1": _norm_params(sd, f"layers.{i}.input_layernorm"),
            "ln2": _norm_params(sd, f"layers.{i}.post_attention_layernorm"),
            "attn": {
                "q": _lin(sd, f"layers.{i}.self_attn.q_proj"),
                "k": _lin(sd, f"layers.{i}.self_attn.k_proj"),
                "v": _lin(sd, f"layers.{i}.self_attn.v_proj"),
                "o": _lin(sd, f"layers.{i}.self_attn.o_proj"),
            },
            "mlp": {
                "gate": _lin(sd, f"layers.{i}.mlp.gate_proj"),
                "up": _lin(sd, f"layers.{i}.mlp.up_proj"),
                "down": _lin(sd, f"layers.{i}.mlp.down_proj"),
            },
        }
        if cfg.qk_norm:
            lp["attn"]["q_norm"] = {"w": np.asarray(sd[f"layers.{i}.self_attn.q_norm.weight"])}
            lp["attn"]["k_norm"] = {"w": np.asarray(sd[f"layers.{i}.self_attn.k_norm.weight"])}
        layers.append(lp)
    params = {"layers": _stack(layers), "norm": _norm_params(sd, "norm")}
    if cfg.has_embed and "embed_tokens.weight" in sd:
        emb = np.asarray(sd["embed_tokens.weight"])
        params["embed"] = {"embedding": emb}
    return params


def attach_lm_head(params: dict, sd: dict, key: str = "lm_head.weight") -> dict:
    if key in sd:
        params["lm_head"] = {"w": np.ascontiguousarray(np.asarray(sd[key]).T)}
    return params


# ---------------------------------------------------------------------------
# Vision towers
# ---------------------------------------------------------------------------


def _conv_patch_to_matmul(w: np.ndarray) -> np.ndarray:
    """[H, C, p, p] conv kernel -> [p*p*C, H] for patchify's (row,col,chan)."""
    h, c, p, _ = w.shape
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(p * p * c, h))


def convert_vit(sd: dict, cfg, prefix: str = "vision_model.") -> dict:
    """CLIP/SigLIP HF vision model -> our ViT params."""
    sd = _strip(sd, prefix)
    params = {}
    pe = np.asarray(sd["embeddings.patch_embedding.weight"])
    params["patch_embed"] = {
        "w": _conv_patch_to_matmul(pe),
        "b": np.asarray(sd.get("embeddings.patch_embedding.bias", np.zeros(pe.shape[0]))),
    }
    pos = np.asarray(sd["embeddings.position_embedding.weight"])
    params["pos_embed"] = pos
    if cfg.use_cls and "embeddings.class_embedding" in sd:
        params["cls"] = np.asarray(sd["embeddings.class_embedding"])
    if cfg.pre_ln and "pre_layrnorm.weight" in sd:  # CLIP's typo'd name
        params["pre_ln"] = {
            "w": np.asarray(sd["pre_layrnorm.weight"]),
            "b": np.asarray(sd["pre_layrnorm.bias"]),
        }
    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}."
        layers.append(
            {
                "ln1": {"w": np.asarray(sd[pre + "layer_norm1.weight"]), "b": np.asarray(sd[pre + "layer_norm1.bias"])},
                "ln2": {"w": np.asarray(sd[pre + "layer_norm2.weight"]), "b": np.asarray(sd[pre + "layer_norm2.bias"])},
                "attn": {
                    "q": _lin(sd, pre + "self_attn.q_proj"),
                    "k": _lin(sd, pre + "self_attn.k_proj"),
                    "v": _lin(sd, pre + "self_attn.v_proj"),
                    "o": _lin(sd, pre + "self_attn.out_proj"),
                },
                "mlp": {
                    "fc1": _lin(sd, pre + "mlp.fc1"),
                    "fc2": _lin(sd, pre + "mlp.fc2"),
                },
            }
        )
    params["layers"] = _stack(layers)
    if "post_layernorm.weight" in sd:
        params["post_ln"] = {
            "w": np.asarray(sd["post_layernorm.weight"]),
            "b": np.asarray(sd["post_layernorm.bias"]),
        }
    else:
        h = cfg.hidden_size
        params["post_ln"] = {"w": np.ones((h,), np.float32), "b": np.zeros((h,), np.float32)}
    return params


# ---------------------------------------------------------------------------
# Projector / DiT / full-policy assembly
# ---------------------------------------------------------------------------


def convert_projector(sd: dict, projector_type: str, prefix: str = "mm_projector.") -> dict:
    sd = _strip(sd, prefix)
    import re

    if projector_type == "linear" or re.match(r"^linear(\d+)x$", projector_type):
        # reference 'linear'/'linear{N}x' is a bare nn.Linear -> keys are
        # 'weight'/'bias' (mm_projector/builder.py:48-60); some checkpoints
        # wrap it in a single-element Sequential ('0.weight')
        if "weight" in sd:
            p = {"w": np.ascontiguousarray(np.asarray(sd["weight"]).T)}
            if "bias" in sd:
                p["b"] = np.asarray(sd["bias"])
            return {"fc": p}
        return {"fc": _lin(sd, "0")}
    if projector_type.startswith("mlp") and "downsample" not in projector_type:
        # nn.Sequential: Linear at even indices (0, 2, 4, ...)
        out = {}
        fc = 0
        i = 0
        while f"{i}.weight" in sd:
            out[f"fc{fc}"] = _lin(sd, str(i))
            fc += 1
            i += 2
        return out
    if projector_type == "mlp_downsample":
        return {
            "ln": {"w": np.asarray(sd["1.weight"]), "b": np.asarray(sd["1.bias"])},
            "fc0": _lin(sd, "2"),
            "fc1": _lin(sd, "4"),
        }
    raise ValueError(projector_type)


def convert_dit(sd: dict, cfg, prefix: str = "action_head.net.") -> dict:
    """CogACT/MemVLA DiT head -> our dit params (models/dit.py layout)."""
    sd = _strip(sd, prefix)
    params = {
        "x_embed": _lin(sd, "x_embedder.linear"),
        "t_mlp": {"fc0": _lin(sd, "t_embedder.mlp.0"), "fc1": _lin(sd, "t_embedder.mlp.2")},
        "z_embed": _lin(sd, "z_embedder.linear"),
        "pos_embed": np.asarray(sd["positional_embedding"]),
        "final": _lin(sd, "final_layer.linear"),
    }
    if "z_embedder.uncondition" in sd:
        params["uncondition"] = np.asarray(sd["z_embedder.uncondition"]).reshape(-1)
    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blk = {
            "attn": {
                "qkv": _lin(sd, pre + "attn.qkv"),
                "o": _lin(sd, pre + "attn.proj"),
            },
            "mlp": {
                "fc0": _lin(sd, pre + "mlp.fc1"),
                "fc1": _lin(sd, pre + "mlp.fc2"),
            },
        }
        if f"{pre}per_attn.in_proj_weight" in sd:
            # MemVLA memory cross-attention: torch MultiheadAttention fused
            # in_proj [3H, H] rows = [q; k; v] + affine norm3
            # (memvla/action_model/dit.py:158-182)
            w = np.asarray(sd[pre + "per_attn.in_proj_weight"])
            b = np.asarray(sd[pre + "per_attn.in_proj_bias"])
            h = w.shape[1]
            blk["xattn"] = {
                "q": {"w": np.ascontiguousarray(w[:h].T), "b": b[:h]},
                "k": {"w": np.ascontiguousarray(w[h : 2 * h].T), "b": b[h : 2 * h]},
                "v": {"w": np.ascontiguousarray(w[2 * h :].T), "b": b[2 * h :]},
                "o": _lin(sd, pre + "per_attn.out_proj"),
                "ln": {
                    "w": np.asarray(sd[pre + "norm3.weight"]),
                    "b": np.asarray(sd[pre + "norm3.bias"]),
                },
            }
        blocks.append(blk)
    params["blocks"] = _stack(blocks)
    if "per_token_embedder.linear.weight" in sd:
        params["per_token_embedder"] = _lin(sd, "per_token_embedder.linear")
    return params


def convert_cogact(sd: dict, cfg) -> dict:
    """Full DB-CogACT checkpoint -> CogACT params."""
    llm = convert_llm(sd, cfg.vlm.llm, prefix="model.llm.")
    llm = attach_lm_head(llm, sd, "lm_head.weight")
    vit = convert_vit(sd, cfg.vlm.vit, prefix="model.mm_vision_tower.vision_tower.vision_model.")
    proj = convert_projector(sd, cfg.vlm.projector_type, prefix="model.mm_projector.")
    dit = convert_dit(sd, cfg.dit, prefix="model.action_head.net.")
    return {"vlm": {"llm": llm, "vit": vit, "projector": proj}, "action_head": dit}


def convert_flow_vla(sd: dict, cfg) -> dict:
    """pi0/pi0.5/DM0 checkpoint -> FlowVLA params."""
    llm = convert_llm(sd, cfg.llm, prefix="model.llm.")
    vit = convert_vit(sd, cfg.vit, prefix="model.mm_vision_tower.vision_tower.vision_model.")
    proj = convert_projector(sd, cfg.projector_type, prefix="model.mm_projector.")
    # pi0/pi0.5 hold the expert as a bare decoder ('model.action_expert.');
    # DM0 wraps it in Qwen3ForCausalLM, nesting one more '.model.'
    # (dm0_arch.py:79-80: self.action_expert = Qwen3ForCausalLM(...))
    expert_prefix = (
        "model.action_expert.model."
        if any(k.startswith("model.action_expert.model.layers.") for k in sd)
        else "model.action_expert."
    )
    expert = convert_llm(sd, cfg.expert, prefix=expert_prefix)
    params = {
        "vlm": {"llm": llm, "vit": vit, "projector": proj},
        "expert": expert,
        "action_in_proj": _lin(sd, "model.action_in_proj"),
        "action_out_proj": _lin(sd, "model.action_out_proj"),
    }
    for ours, theirs in (
        ("state_proj", "model.state_proj"),
        ("time_mlp_in", "model.action_time_mlp_in"),
        ("time_mlp_out", "model.action_time_mlp_out"),
        ("time_mlp_in", "model.time_mlp_in"),
        ("time_mlp_out", "model.time_mlp_out"),
    ):
        if f"{theirs}.weight" in sd and ours not in params:
            params[ours] = _lin(sd, theirs)
    return params


# ---------------------------------------------------------------------------
# OFT heads (oft/action_model/model.py)
# ---------------------------------------------------------------------------


def _convert_mlp_resnet(sd: dict, prefix: str, num_blocks: int = 2) -> dict:
    """torch MLPResNet (model.py:104-126) -> our mlp_resnet layout."""
    sd = _strip(sd, prefix)

    def ln(name):
        return {"w": np.asarray(sd[f"{name}.weight"]), "b": np.asarray(sd[f"{name}.bias"])}

    return {
        "ln1": ln("layer_norm1"),
        "fc1": _lin(sd, "fc1"),
        "ln2": ln("layer_norm2"),
        "fc2": _lin(sd, "fc2"),
        "blocks": [
            {
                "ln": ln(f"mlp_resnet_blocks.{i}.ffn.0"),
                "fc": _lin(sd, f"mlp_resnet_blocks.{i}.ffn.1"),
            }
            for i in range(num_blocks)
        ],
    }


def convert_oft(sd: dict, cfg) -> dict:
    """DB-OFT checkpoint (L1 / Diffusion / Discrete head) -> our OFT params.
    Reference layout: model.action_head.{action_query, model.* (MLPResNet),
    noisy_action_projector.*, noise_predictor.mlp_resnet.*,
    proprio_projector.*} (oft/action_model/model.py:129-271)."""
    llm = convert_llm(sd, cfg.vlm.llm, prefix="model.llm.")
    llm = attach_lm_head(llm, sd, "lm_head.weight")
    vit = convert_vit(sd, cfg.vlm.vit, prefix="model.mm_vision_tower.vision_tower.vision_model.")
    proj = convert_projector(sd, cfg.vlm.projector_type, prefix="model.mm_projector.")
    head: dict = {}
    t = cfg.action_model_type
    if "L1" in t or "Linear" in t:
        head["action_query"] = np.asarray(sd["model.action_head.action_query"])[0]
        head["mlp"] = _convert_mlp_resnet(sd, "model.action_head.model.")
    elif "Diffusion" in t or "DiT" in t:
        head["noisy_action_projector"] = {
            "fc1": _lin(sd, "model.action_head.noisy_action_projector.fc1"),
            "fc2": _lin(sd, "model.action_head.noisy_action_projector.fc2"),
        }
        head["noise_predictor"] = _convert_mlp_resnet(
            sd, "model.action_head.noise_predictor.mlp_resnet."
        )
    # Discrete: no extra head params (bin logits come from lm_head)
    if cfg.use_proprio:
        head["proprio_projector"] = {
            "fc1": _lin(sd, "model.action_head.proprio_projector.fc1"),
            "fc2": _lin(sd, "model.action_head.proprio_projector.fc2"),
        }
    return {"vlm": {"llm": llm, "vit": vit, "projector": proj}, "action_head": head}


# ---------------------------------------------------------------------------
# MemVLA (memvla/memvla_arch.py + memvla/action_model/dit.py)
# ---------------------------------------------------------------------------


def _conv1x1(sd, name):
    """1x1 Conv2d [out, in, 1, 1] -> per-token linear."""
    w = np.asarray(sd[f"{name}.weight"])
    return {
        "w": np.ascontiguousarray(w[:, :, 0, 0].T),
        "b": np.asarray(sd[f"{name}.bias"]),
    }


def _convert_cross_block(sd: dict, prefix: str) -> dict:
    """CrossTransformerBlock (memvla_arch.py:82-132) -> our cross_block."""
    sd = _strip(sd, prefix)

    def ln(name):
        return {"w": np.asarray(sd[f"{name}.weight"]), "b": np.asarray(sd[f"{name}.bias"])}

    return {
        "q": _lin(sd, "q_proj"),
        "k": _lin(sd, "k_proj"),
        "v": _lin(sd, "v_proj"),
        "attn_ln": ln("attn_norm"),
        "ffn": {"fc1": _lin(sd, "ffn.0"), "fc2": _lin(sd, "ffn.3")},
        "ffn_ln": ln("ffn_norm"),
    }


def convert_memvla(sd: dict, cfg) -> dict:
    """DB-MemVLA checkpoint -> our MemVLA params (incl. the surgically-
    rebuilt memory head, memvla_arch.py:511-533: per_compr SE bottleneck,
    per/cog retrieval blocks + gates + timestep embedders, and the DiT with
    per-token cross-attention)."""
    llm = convert_llm(sd, cfg.vlm.llm, prefix="model.llm.")
    llm = attach_lm_head(llm, sd, "lm_head.weight")
    vit = convert_vit(sd, cfg.vlm.vit, prefix="model.mm_vision_tower.vision_tower.vision_model.")
    proj = convert_projector(sd, cfg.vlm.projector_type, prefix="model.mm_projector.")

    per_compr = {
        "excite": {
            "fc1": _conv1x1(sd, "model.per_compr.excite.1"),
            "fc2": _conv1x1(sd, "model.per_compr.excite.3"),
        },
        "reduce": {
            "fc1": _conv1x1(sd, "model.per_compr.reduce.0"),
            "fc2": _conv1x1(sd, "model.per_compr.reduce.2"),
        },
    }

    bank = {}
    for role in ("per", "cog"):
        role_p = {
            "retrieval": [
                _convert_cross_block(
                    sd, f"model.per_cog_mem_bank.retrieval_blocks.{role}.{i}."
                )
                for i in range(cfg.retrieval_layers)
            ]
        }
        gk = f"model.per_cog_mem_bank.gate_fusion_blocks.{role}.proj"
        if f"{gk}.weight" in sd:
            role_p["gate"] = {"proj": _lin(sd, gk)}
        tk = f"model.per_cog_mem_bank.timestep_embedders.{role}.mlp"
        if f"{tk}.0.weight" in sd:
            role_p["time"] = {"fc0": _lin(sd, f"{tk}.0"), "fc1": _lin(sd, f"{tk}.2")}
        bank[role] = role_p

    dit = convert_dit(sd, cfg.dit, prefix="model.action_head.net.")
    return {
        "vlm": {"llm": llm, "vit": vit, "projector": proj},
        "per_compr": per_compr,
        "mem_bank": bank,
        "action_head": dit,
    }


# ---------------------------------------------------------------------------
# MUVLA (muvla/muvla_arch.py)
# ---------------------------------------------------------------------------


def _convert_torch_mha(sd: dict, prefix: str) -> dict:
    """torch nn.MultiheadAttention (packed in_proj_weight/bias) -> our
    _mha q/k/v/o layout (models/muvla.py:54-76)."""
    sd = _strip(sd, prefix)
    w = np.asarray(sd["in_proj_weight"])  # [3D, D]
    b = np.asarray(sd["in_proj_bias"])
    d = w.shape[1]

    def part(i):
        return {
            "w": np.ascontiguousarray(w[i * d : (i + 1) * d].T),
            "b": np.asarray(b[i * d : (i + 1) * d]),
        }

    return {
        "q": part(0), "k": part(1), "v": part(2),
        "o": {
            "w": np.ascontiguousarray(np.asarray(sd["out_proj.weight"]).T),
            "b": np.asarray(sd["out_proj.bias"]),
        },
    }


def _ln(sd: dict, name: str) -> dict:
    return {"w": np.asarray(sd[f"{name}.weight"]), "b": np.asarray(sd[f"{name}.bias"])}


def convert_muvla_fuser(sd: dict, prefix: str = "model.fuser.") -> dict:
    """CrossFuseReduce (muvla_arch.py:28-49; forward uses only cross_attn +
    residual LayerNorm) -> our fuser params."""
    sd = _strip(sd, prefix)
    return {"attn": _convert_torch_mha(sd, "cross_attn."), "ln": _ln(sd, "ln")}


def convert_muvla_qformer(sd: dict, prefix: str = "model.history_qformer.") -> dict:
    """SimpleQFormer (muvla_arch.py:51-66) -> our qformer params."""
    sd = _strip(sd, prefix)
    return {
        "queries": np.asarray(sd["query_embeddings"]),
        "input_proj": _lin(sd, "input_proj"),
        "attn": _convert_torch_mha(sd, "attn."),
        "ln": _ln(sd, "norm"),
    }


def convert_muvla(sd: dict, cfg) -> dict:
    """DB-MUVLA checkpoint -> our MUVLA params (dual towers + fuser +
    history QFormer + reward head, muvla_arch.py:68-140,482)."""
    llm = convert_llm(sd, cfg.vlm.llm, prefix="model.llm.")
    llm = attach_lm_head(llm, sd, "lm_head.weight")
    return {
        "llm": llm,
        "vit": convert_vit(sd, cfg.vlm.vit, prefix="model.mm_vision_tower.vision_tower.vision_model."),
        "obs_vit": convert_vit(sd, cfg.obs_vit, prefix="model.obs_vision_tower.vision_tower.vision_model."),
        "projector": convert_projector(sd, cfg.vlm.projector_type, prefix="model.mm_projector."),
        "fuser": convert_muvla_fuser(sd),
        "qformer": convert_muvla_qformer(sd),
        "reward_head": {"w": np.ascontiguousarray(np.asarray(sd["reward_head.weight"]).T)},
    }
