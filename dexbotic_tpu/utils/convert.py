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


def convert_llm(sd: dict, cfg, prefix: str = "") -> dict:
    """HF decoder state_dict -> transformer params.  `prefix` example:
    'model.' (bare LlamaModel), 'model.llm.' (dexbotic VLM)."""
    sd = _strip(sd, prefix)
    layers = []
    for i in range(cfg.num_layers):
        lp = {
            "ln1": {"w": np.asarray(sd[f"layers.{i}.input_layernorm.weight"])},
            "ln2": {"w": np.asarray(sd[f"layers.{i}.post_attention_layernorm.weight"])},
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
    params = {"layers": _stack(layers), "norm": {"w": np.asarray(sd["norm.weight"])}}
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
    if projector_type == "linear":
        return {"fc": _lin(sd, "")} if "weight" in sd else {"fc": {"w": np.asarray(sd["0.weight"]).T}}
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
        blocks.append(blk)
    params["blocks"] = _stack(blocks)
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
    expert = convert_llm(sd, cfg.expert, prefix="model.action_expert.")
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
