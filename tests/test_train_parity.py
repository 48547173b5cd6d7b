"""Training-step parity vs the reference torch backward (VERDICT r3 #2).

Shared (t, noise) draws are injected into the reference's training losses —
CogACT's x4-repeated diffusion MSE (cogact_arch.py:124-135, action_models.py
:102-125) and pi0's Beta(1.5,1)-time flow MSE (pi0_arch.py:337-388) — and
into ours; both the LOSS and a sample of parameter GRADIENTS (DiT/expert
head, projector, LLM attention) must agree <=1e-3 in fp32.  This pins
fine-tuning behavior, not just inference.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.vlm import VLMConfig

from test_policy_parity import (
    CLIP_T,
    GEMMA_EXPERT_T,
    GEMMA_T,
    LLAMA_T,
    SIGLIP_T,
    CompatCache,
    _install_ref_env,
    _llama_hf,
    _sd,
)

ATOL = 1e-3


@pytest.fixture(scope="module")
def ref_env():
    _install_ref_env()
    yield


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    from transformers import CLIPImageProcessor, CLIPVisionConfig, CLIPVisionModel

    d = tmp_path_factory.mktemp("towers") / "tiny-clip-vit"
    torch.manual_seed(0)
    cfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, projection_dim=32,
    )
    CLIPVisionModel(cfg).save_pretrained(d)
    CLIPImageProcessor(crop_size=28, size=28).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def siglip_dir(tmp_path_factory):
    from transformers import SiglipImageProcessor, SiglipVisionConfig, SiglipVisionModel

    d = tmp_path_factory.mktemp("towers") / "tiny-siglip-tower"
    torch.manual_seed(5)
    cfg = SiglipVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
    )
    SiglipVisionModel(cfg).save_pretrained(d)
    SiglipImageProcessor(size={"height": 28, "width": 28}).save_pretrained(d)
    return str(d)


def _ref_grads(ref, names):
    out = {}
    for n, p in ref.named_parameters():
        if n in names:
            assert p.grad is not None, f"no grad on {n}"
            out[n] = p.grad.detach().float().numpy()
    assert set(out) == set(names), set(names) - set(out)
    return out


def _leaf(tree, path):
    for k in path:
        tree = tree[k]
    return np.asarray(tree)


def _check_grads(pairs, ref_g, our_g, atol=ATOL):
    """pairs: (torch_name, ours_path, layer_idx_or_None).  torch linear
    weights are [out, in]; ours are [in, out] (transposed); stacked-layer
    leaves are indexed on axis 0."""
    for name, path, idx in pairs:
        r = ref_g[name].T
        o = _leaf(our_g, path)
        if idx is not None:
            o = o[idx]
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(
            o, r, atol=max(atol, atol * scale), err_msg=f"{name} (scale {scale:.2e})"
        )


# ---------------------------------------------------------------------------
# CogACT: repeated diffusion loss + grads
# ---------------------------------------------------------------------------


def test_cogact_training_parity(ref_env, clip_dir):
    from dexbotic.model.cogact.cogact_arch import CogACTForCausalLM
    from dexbotic.model.cogact.cogact_arch import CogActConfig as RefCfg

    from dexbotic_tpu.models.cogact import CogActConfig, cogact_loss
    from dexbotic_tpu.utils.convert import convert_cogact

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="DiT-S",
        action_dim=7, chunk_size=4,
    )
    torch.manual_seed(51)
    # .eval() so the DiT's class-dropout and any tower dropout are off on
    # both sides; gradients still flow
    ref = CogACTForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(52)
    B, rep = 2, 4
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13],
                        [1, 5, IMAGE_TOKEN_INDEX, 21, 23, 2]])
    amask = np.ones((B, 6), bool)
    img = rs.randn(B, 3, 28, 28).astype(np.float32)
    actions = rs.randn(B, 6, 7).astype(np.float32)  # >=chunk rows; [:4] used
    # pinned draws for the x4-repeated batch (action_models.py:106-109)
    t_pin = rs.randint(0, 100, (B * rep,)).astype(np.int64)
    noise_pin = rs.randn(B * rep, 4, 7).astype(np.float32)

    orig_rl, orig_ri = torch.randn_like, torch.randint
    torch.randn_like = lambda x, **k: torch.tensor(noise_pin).to(x.dtype)
    torch.randint = lambda lo, hi, size, **k: torch.tensor(t_pin)
    try:
        out = ref(
            input_ids=torch.tensor(ids_ref),
            attention_mask=torch.tensor(amask),
            images=torch.tensor(img),
            actions=torch.tensor(actions),
            repeated_diffusion_steps=rep,
        )
    finally:
        torch.randn_like, torch.randint = orig_rl, orig_ri
    out.loss.backward()

    GRAD_NAMES = [
        "model.action_head.net.final_layer.linear.weight",
        "model.action_head.net.blocks.0.attn.qkv.weight",
        "model.action_head.net.z_embedder.linear.weight",
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.llm.layers.1.mlp.down_proj.weight",
        "model.mm_projector.0.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    cfg = CogActConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="DiT-S", action_dim=7, chunk_size=4,
    )
    params = convert_cogact(_sd(ref), cfg)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([
        [1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13],
        [1, 5] + [IMAGE_TOKEN_INDEX] * nt + [21, 23, 2],
    ])
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        "actions": jnp.asarray(actions),
    }

    def loss_fn(p):
        return cogact_loss(
            p, cfg, batch, jax.random.PRNGKey(0),
            diffusion_t=jnp.asarray(t_pin, jnp.int32),
            diffusion_noise=jnp.asarray(noise_pin),
        )[0]

    loss, our_g = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_head.net.final_layer.linear.weight",
             ("action_head", "final", "w"), None),
            ("model.action_head.net.blocks.0.attn.qkv.weight",
             ("action_head", "blocks", "attn", "qkv", "w"), 0),
            ("model.action_head.net.z_embedder.linear.weight",
             ("action_head", "z_embed", "w"), None),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.llm.layers.1.mlp.down_proj.weight",
             ("vlm", "llm", "layers", "mlp", "down", "w"), 1),
            ("model.mm_projector.0.weight",
             ("vlm", "projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )


# ---------------------------------------------------------------------------
# pi0: flow-matching loss + grads (Beta(1.5,1) time pinned)
# ---------------------------------------------------------------------------


def test_pi0_training_parity(ref_env, siglip_dir):
    from transformers import GemmaConfig

    from dexbotic.model.pi0 import pi0_arch

    from dexbotic_tpu.models.flow_vla import flow_vla_loss, pi0_config
    from dexbotic_tpu.utils.convert import convert_flow_vla

    pi0_arch.DynamicCache = CompatCache
    llm_cfg = GemmaConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=256, rms_norm_eps=1e-6,
        attention_dropout=0.0, tie_word_embeddings=True,
    )
    exp_cfg = GemmaConfig(
        vocab_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=64, max_position_embeddings=256, rms_norm_eps=1e-6,
        attention_dropout=0.0,
    )
    cfg_r = pi0_arch.Pi0Config(
        llm_config=llm_cfg, mm_vision_tower=siglip_dir, action_config=exp_cfg,
        mm_projector_type="linear", action_dim=8, chunk_size=5,
    )
    torch.manual_seed(53)
    ref = pi0_arch.Pi0ForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(54)
    B = 2
    ids = rs.randint(1, 500, (B, 6))
    amask = np.ones((B, 6), bool)
    images = rs.randn(B, 2, 3, 28, 28).astype(np.float32)
    image_masks = np.array([[True, False], [True, True]])
    states = rs.randn(B, 8).astype(np.float32)
    actions = rs.randn(B, 5, 8).astype(np.float32)
    noise_pin = rs.randn(B, 5, 8).astype(np.float32)
    beta_pin = rs.beta(1.5, 1.0, (B,)).astype(np.float32)

    class _PinnedBeta:
        def __init__(self, *a, **k):
            pass

        def sample(self, shape):
            return torch.tensor(beta_pin[: shape[0]])

    orig_normal, orig_beta = torch.normal, torch.distributions.Beta
    torch.normal = lambda *a, **k: torch.tensor(noise_pin)
    torch.distributions.Beta = _PinnedBeta
    try:
        out = ref(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(amask),
            states=torch.tensor(states),
            images=torch.tensor(images),
            image_masks=torch.tensor(image_masks),
            actions=torch.tensor(actions),
        )
    finally:
        torch.normal, torch.distributions.Beta = orig_normal, orig_beta
    out.loss.backward()

    GRAD_NAMES = [
        "model.action_out_proj.weight",
        "model.action_in_proj.weight",
        "model.state_proj.weight",
        "model.action_time_mlp_in.weight",
        "model.action_expert.layers.0.self_attn.q_proj.weight",
        "model.llm.layers.0.self_attn.q_proj.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    cfg = pi0_config(GEMMA_T, GEMMA_EXPERT_T, SIGLIP_T, action_dim=8,
                     chunk_size=5, projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(amask, jnp.int32),
        "images": jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        "image_masks": jnp.asarray(image_masks, jnp.int32),
        "states": jnp.asarray(states),
        "actions": jnp.asarray(actions),
    }
    time_pin = beta_pin * 0.999 + 0.001

    def loss_fn(p):
        return flow_vla_loss(
            p, cfg, batch, jax.random.PRNGKey(0),
            noise=jnp.asarray(noise_pin), time=jnp.asarray(time_pin),
        )[0]

    loss, our_g = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_out_proj.weight", ("action_out_proj", "w"), None),
            ("model.action_in_proj.weight", ("action_in_proj", "w"), None),
            ("model.state_proj.weight", ("state_proj", "w"), None),
            ("model.action_time_mlp_in.weight", ("time_mlp_in", "w"), None),
            ("model.action_expert.layers.0.self_attn.q_proj.weight",
             ("expert", "layers", "attn", "q", "w"), 0),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
        ],
        ref_g, our_g,
    )


# ---------------------------------------------------------------------------
# OFT-L1: action-query L1 regression loss + grads (no sampling — fully
# deterministic; oft_arch.py:104-152, action_model/model.py:129-160)
# ---------------------------------------------------------------------------


def test_oft_l1_training_parity(ref_env, clip_dir):
    from dexbotic.model.oft.oft_arch import OFTConfig as RefCfg
    from dexbotic.model.oft.oft_arch import OFTForCausalLM

    from dexbotic_tpu.models.oft import OFTConfig, oft_loss
    from dexbotic_tpu.utils.convert import convert_oft

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="Linear",
        action_dim=7, chunk_size=4, use_proprio=True, proprio_dim=9,
    )
    torch.manual_seed(61)
    ref = OFTForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(62)
    B = 2
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13],
                        [1, 5, IMAGE_TOKEN_INDEX, 21, 23, 2]])
    amask = np.ones((B, 6), bool)
    img = rs.randn(B, 3, 28, 28).astype(np.float32)
    states = rs.randn(B, 9).astype(np.float32)
    actions = rs.randn(B, 6, 7).astype(np.float32)  # [:4] used

    out = ref(
        input_ids=torch.tensor(ids_ref), attention_mask=torch.tensor(amask),
        images=torch.tensor(img), actions=torch.tensor(actions),
        states=torch.tensor(states),
    )
    out.loss.backward()

    GRAD_NAMES = [
        "model.action_head.model.fc2.weight",
        "model.action_head.model.mlp_resnet_blocks.0.ffn.1.weight",
        "model.action_head.proprio_projector.fc1.weight",
        "model.action_head.action_query",
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.mm_projector.0.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    cfg = OFTConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="L1", action_dim=7, chunk_size=4,
        use_proprio=True, proprio_dim=9,
    )
    params = convert_oft(_sd(ref), cfg)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([
        [1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13],
        [1, 5] + [IMAGE_TOKEN_INDEX] * nt + [21, 23, 2],
    ])
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        "actions": jnp.asarray(actions),
        "states": jnp.asarray(states),
    }
    loss, our_g = jax.jit(jax.value_and_grad(
        lambda p: oft_loss(p, cfg, batch, jax.random.PRNGKey(0))[0]
    ))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_head.model.fc2.weight",
             ("action_head", "mlp", "fc2", "w"), None),
            ("model.action_head.model.mlp_resnet_blocks.0.ffn.1.weight",
             ("action_head", "mlp", "blocks", 0, "fc", "w"), None),
            ("model.action_head.proprio_projector.fc1.weight",
             ("action_head", "proprio_projector", "fc1", "w"), None),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.mm_projector.0.weight",
             ("vlm", "projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )
    # action_query is [1, A, H] on the torch side, [A, H] on ours (no .T)
    np.testing.assert_allclose(
        _leaf(our_g, ("action_head", "action_query")),
        ref_g["model.action_head.action_query"][0], atol=ATOL,
    )


# ---------------------------------------------------------------------------
# OFT-Diffusion ("DiT"): noisy-action-token MSE loss + grads with pinned
# (t, noise) — the first pin of this head anywhere (oft_arch.py:104-155,
# action_model/model.py:197-271)
# ---------------------------------------------------------------------------


def test_oft_diffusion_training_parity(ref_env, clip_dir):
    from dexbotic.model.oft.oft_arch import OFTConfig as RefCfg
    from dexbotic.model.oft.oft_arch import OFTForCausalLM

    from dexbotic_tpu.models.oft import OFTConfig, oft_loss
    from dexbotic_tpu.utils.convert import convert_oft

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="DiT",
        action_dim=7, chunk_size=4,
    )
    torch.manual_seed(63)
    ref = OFTForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(64)
    B = 2
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13],
                        [1, 5, IMAGE_TOKEN_INDEX, 21, 23, 2]])
    amask = np.ones((B, 6), bool)
    img = rs.randn(B, 3, 28, 28).astype(np.float32)
    actions = rs.randn(B, 6, 7).astype(np.float32)
    t_pin = rs.randint(0, 100, (B,)).astype(np.int64)
    noise_pin = rs.randn(B, 4, 7).astype(np.float32)

    orig_rn, orig_ri = torch.randn, torch.randint
    torch.randn = lambda *a, **k: torch.tensor(noise_pin)
    torch.randint = lambda *a, **k: torch.tensor(t_pin)
    try:
        out = ref(
            input_ids=torch.tensor(ids_ref),
            attention_mask=torch.tensor(amask),
            images=torch.tensor(img), actions=torch.tensor(actions),
        )
    finally:
        torch.randn, torch.randint = orig_rn, orig_ri
    out.loss.backward()

    GRAD_NAMES = [
        "model.action_head.noise_predictor.mlp_resnet.fc2.weight",
        "model.action_head.noise_predictor.mlp_resnet.mlp_resnet_blocks.1.ffn.1.weight",
        "model.action_head.noisy_action_projector.fc1.weight",
        "model.llm.layers.1.self_attn.q_proj.weight",
        "model.mm_projector.0.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    cfg = OFTConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="Diffusion", action_dim=7, chunk_size=4,
    )
    params = convert_oft(_sd(ref), cfg)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([
        [1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13],
        [1, 5] + [IMAGE_TOKEN_INDEX] * nt + [21, 23, 2],
    ])
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        "actions": jnp.asarray(actions),
    }
    loss, our_g = jax.jit(jax.value_and_grad(
        lambda p: oft_loss(
            p, cfg, batch, jax.random.PRNGKey(0),
            diffusion_t=jnp.asarray(t_pin, jnp.int32),
            diffusion_noise=jnp.asarray(noise_pin),
        )[0]
    ))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_head.noise_predictor.mlp_resnet.fc2.weight",
             ("action_head", "noise_predictor", "fc2", "w"), None),
            ("model.action_head.noise_predictor.mlp_resnet.mlp_resnet_blocks.1.ffn.1.weight",
             ("action_head", "noise_predictor", "blocks", 1, "fc", "w"), None),
            ("model.action_head.noisy_action_projector.fc1.weight",
             ("action_head", "noisy_action_projector", "fc1", "w"), None),
            ("model.llm.layers.1.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 1),
            ("model.mm_projector.0.weight",
             ("vlm", "projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )


# ---------------------------------------------------------------------------
# MemVLA: memory-conditioned DiT diffusion loss + grads through the bank
# (memvla_arch.py:546-658, action_model/action_models.py:72-89)
# ---------------------------------------------------------------------------


def test_memvla_training_parity(ref_env, clip_dir):
    from dexbotic.model.memvla.memvla_arch import MemVLAConfig as RefCfg
    from dexbotic.model.memvla.memvla_arch import MemVLAForCausalLM

    from dexbotic_tpu.models.memvla import MemVLAConfig, init_mem_state, memvla_loss
    from dexbotic_tpu.utils.convert import convert_memvla

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="DiT-S",
        action_dim=7, chunk_size=4, per_token_size=16, mem_length=4,
        retrieval_layers=2, use_timestep_pe=True, fusion_type="gate",
        consolidate_type="tome", update_fused=True,
        dataloader_type="parallel_stream", group_size=2,
    )
    torch.manual_seed(65)
    ref = MemVLAForCausalLM(cfg_r).eval().float()
    # the reference feeds dropout_p=0.1 straight into F.scaled_dot_product_
    # attention (memvla_arch.py:122-124) which ignores eval(); zero it
    for blocks in ref.model.per_cog_mem_bank.retrieval_blocks.values():
        for blk in blocks:
            blk.dropout = 0.0

    rs = np.random.RandomState(66)
    B, rep = 2, 4
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13],
                        [1, 5, IMAGE_TOKEN_INDEX, 21, 23, 2]])
    amask = np.ones((B, 6), bool)
    img = rs.randn(B, 3, 28, 28).astype(np.float32)
    actions = rs.randn(B, 6, 7).astype(np.float32)
    t_pin = rs.randint(0, 100, (B * rep,)).astype(np.int64)
    noise_pin = rs.randn(B * rep, 4, 7).astype(np.float32)

    orig_rl, orig_ri = torch.randn_like, torch.randint
    torch.randn_like = lambda x, **k: torch.tensor(noise_pin).to(x.dtype)
    torch.randint = lambda *a, **k: torch.tensor(t_pin)
    try:
        out = ref(
            input_ids=torch.tensor(ids_ref),
            attention_mask=torch.tensor(amask),
            images=torch.tensor(img), actions=torch.tensor(actions),
            indexes=[(0, 0, 0), (0, 1, 0)],  # two fresh episodes, timestep 0
            repeated_diffusion_steps=rep,
        )
    finally:
        torch.randn_like, torch.randint = orig_rl, orig_ri
    out.loss.backward()

    GRAD_NAMES = [
        "model.action_head.net.final_layer.linear.weight",
        "model.action_head.net.blocks.0.per_attn.out_proj.weight",
        "model.action_head.net.per_token_embedder.linear.weight",
        "model.per_compr.reduce.0.weight",
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.mm_projector.0.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    cfg = MemVLAConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="DiT-S", action_dim=7, chunk_size=4,
        per_token_size=16, mem_length=4,
    )
    params = convert_memvla(_sd(ref), cfg)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([
        [1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13],
        [1, 5] + [IMAGE_TOKEN_INDEX] * nt + [21, 23, 2],
    ])
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        "actions": jnp.asarray(actions),
        "timesteps": jnp.zeros((B,), jnp.float32),
    }
    state0 = init_mem_state(cfg, B)

    def loss_fn(p):
        return memvla_loss(
            p, cfg, batch, state0, jax.random.PRNGKey(0),
            diffusion_t=jnp.asarray(t_pin, jnp.int32),
            diffusion_noise=jnp.asarray(noise_pin),
        )[0]

    loss, our_g = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_head.net.final_layer.linear.weight",
             ("action_head", "final", "w"), None),
            ("model.action_head.net.blocks.0.per_attn.out_proj.weight",
             ("action_head", "blocks", "xattn", "o", "w"), 0),
            ("model.action_head.net.per_token_embedder.linear.weight",
             ("action_head", "per_token_embedder", "w"), None),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.mm_projector.0.weight",
             ("vlm", "projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )
    # per_compr 1x1 conv: torch [out, in, 1, 1] vs our linear [in, out]
    np.testing.assert_allclose(
        _leaf(our_g, ("per_compr", "reduce", "fc1", "w")),
        ref_g["model.per_compr.reduce.0.weight"].squeeze((2, 3)).T, atol=ATOL,
    )


# ---------------------------------------------------------------------------
# DM0: Qwen3-pair flow-matching loss + grads (Beta(1.5,1) time pinned;
# dm0_arch.py:408-512)
# ---------------------------------------------------------------------------


def test_dm0_training_parity(ref_env, siglip_dir):
    import dataclasses

    from transformers import Qwen3Config

    from dexbotic.model.dm0 import dm0_arch

    from dexbotic_tpu.models.flow_vla import dm0_config, flow_vla_loss
    from dexbotic_tpu.utils.convert import convert_flow_vla

    dm0_arch.DynamicCache = CompatCache
    llm_cfg = Qwen3Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, attention_dropout=0.0, tie_word_embeddings=True,
    )
    exp_cfg = Qwen3Config(
        vocab_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=64, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, attention_dropout=0.0,
    )
    cfg_r = dm0_arch.DM0Config(
        llm_config=llm_cfg, mm_vision_tower=siglip_dir, action_config=exp_cfg,
        mm_projector_type="linear", action_dim=8, chunk_size=5, bf16=False,
    )
    torch.manual_seed(67)
    ref = dm0_arch.DM0ForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(68)
    B = 2
    ids = rs.randint(1, 500, (B, 6))
    amask = np.ones((B, 6), bool)
    images = rs.randn(B, 2, 3, 28, 28).astype(np.float32)
    image_masks = np.array([[True, False], [True, True]])
    actions = rs.randn(B, 5, 8).astype(np.float32)
    noise_pin = rs.randn(B, 5, 8).astype(np.float32)
    beta_pin = rs.beta(1.5, 1.0, (B,)).astype(np.float32)

    class _PinnedBeta:
        def __init__(self, *a, **k):
            pass

        def sample(self, shape):
            return torch.tensor(beta_pin[: shape[0]])

    orig_normal, orig_beta = torch.normal, torch.distributions.Beta
    torch.normal = lambda *a, **k: torch.tensor(noise_pin)
    torch.distributions.Beta = _PinnedBeta
    try:
        out = ref(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(amask),
            images=torch.tensor(images),
            image_masks=torch.tensor(image_masks),
            actions=torch.tensor(actions),
        )
    finally:
        torch.normal, torch.distributions.Beta = orig_normal, orig_beta
    out.loss.backward()

    GRAD_NAMES = [
        "model.action_out_proj.weight",
        "model.action_in_proj.weight",
        "model.action_time_mlp_in.weight",
        "model.action_expert.model.layers.0.self_attn.q_proj.weight",
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.mm_projector.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    qwen_t = dataclasses.replace(LLAMA_T, qk_norm=True)
    qwen_expert_t = dataclasses.replace(
        LLAMA_T, vocab_size=8, hidden_size=32, intermediate_size=64,
        qk_norm=True, has_embed=False,
    )
    cfg = dm0_config(qwen_t, qwen_expert_t, SIGLIP_T, action_dim=8,
                     chunk_size=5, projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(amask, jnp.int32),
        "images": jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        "image_masks": jnp.asarray(image_masks, jnp.int32),
        "actions": jnp.asarray(actions),
    }
    time_pin = beta_pin * 0.999 + 0.001

    def loss_fn(p):
        return flow_vla_loss(
            p, cfg, batch, jax.random.PRNGKey(0),
            noise=jnp.asarray(noise_pin), time=jnp.asarray(time_pin),
        )[0]

    loss, our_g = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_out_proj.weight", ("action_out_proj", "w"), None),
            ("model.action_in_proj.weight", ("action_in_proj", "w"), None),
            ("model.action_time_mlp_in.weight", ("time_mlp_in", "w"), None),
            ("model.action_expert.model.layers.0.self_attn.q_proj.weight",
             ("expert", "layers", "attn", "q", "w"), 0),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.mm_projector.weight",
             ("vlm", "projector", "fc", "w"), None),
        ],
        ref_g, our_g,
    )


# ---------------------------------------------------------------------------
# NaVILA: soft cross-entropy over time tokens (training-mode loss;
# navila_arch.py:473-487, model/navila/loss.py:11-71)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def siglip42_dir(tmp_path_factory):
    """42x42 siglip -> 3x3 grid: mlp_downsample's odd-grid padding branch
    (the only branch the reference's DownSampleBlock can execute)."""
    from transformers import SiglipImageProcessor, SiglipVisionConfig, SiglipVisionModel

    d = tmp_path_factory.mktemp("towers") / "tiny-siglip42-tower"
    torch.manual_seed(90)
    cfg = SiglipVisionConfig(
        image_size=42, patch_size=14, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
    )
    SiglipVisionModel(cfg).save_pretrained(d)
    SiglipImageProcessor(size={"height": 42, "width": 42}).save_pretrained(d)
    return str(d)


def test_navila_training_parity(ref_env, siglip42_dir):
    import dataclasses

    from dexbotic.model.navila.navila_arch import NaVILAForCausalLM

    from dexbotic_tpu.models.navila import NaVILAConfig, navila_loss
    from dexbotic_tpu.utils.convert import (
        attach_lm_head, convert_llm, convert_projector, convert_vit,
    )

    soft_ids = [10, 11, 12, 13, 14]
    cfg_r = NaVILAForCausalLM.config_class(
        llm_config=_llama_hf().to_dict(), mm_vision_tower=siglip42_dir,
        mm_projector_type="mlp_downsample",
        time_token_ids=soft_ids, soft_ce_std=1.0,
    )
    torch.manual_seed(69)
    ref = NaVILAForCausalLM(cfg_r).float()
    ref.train()  # soft CE only fires in training mode; all dropouts are 0

    rs = np.random.RandomState(70)
    B, frames = 2, 2
    # two <image> placeholders per row; answer mixes soft + regular tokens
    ids_ref = np.array([
        [1, 7, IMAGE_TOKEN_INDEX, 8, IMAGE_TOKEN_INDEX, 9, 30, 11, 12, 2],
        [1, 5, IMAGE_TOKEN_INDEX, 6, IMAGE_TOKEN_INDEX, 4, 40, 13, 10, 2],
    ])
    labels_ref = np.full_like(ids_ref, -100)
    labels_ref[:, 6:] = ids_ref[:, 6:]  # answer region
    amask = np.ones(ids_ref.shape, bool)
    imgs = rs.randn(B, frames, 3, 42, 42).astype(np.float32)

    out = ref(
        input_ids=torch.tensor(ids_ref),
        attention_mask=torch.tensor(amask),
        images=torch.tensor(imgs),
        labels=torch.tensor(labels_ref),
    )
    out.loss.backward()

    GRAD_NAMES = [
        "model.llm.embed_tokens.weight",  # TIED to lm_head (outer config)
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.llm.layers.1.mlp.down_proj.weight",
        "model.mm_projector.2.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    cfg = NaVILAConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=dataclasses.replace(SIGLIP_T, image_size=42),
                      projector_type="mlp_downsample"),
        num_video_frames=frames, use_soft_ce=True, soft_ce_std=1.0,
    )
    sd = _sd(ref)
    params = {"vlm": {
        "llm": attach_lm_head(
            convert_llm(sd, cfg.vlm.llm, prefix="model.llm."), sd),
        "vit": convert_vit(
            sd, cfg.vlm.vit,
            prefix="model.mm_vision_tower.vision_tower.vision_model."),
        "projector": convert_projector(
            sd, "mlp_downsample", prefix="model.mm_projector."),
    }}
    nt = cfg.vlm.num_image_tokens  # per-frame tokens after downsample

    def expand(row, fill):
        out_row = []
        for tok in row:
            if tok == IMAGE_TOKEN_INDEX:
                out_row.extend([fill] * nt)
            else:
                out_row.append(tok)
        return out_row

    def expand_labels(id_row, lab_row):
        # image positions expand to nt IGNOREs, like the reference's
        # _insert_multimodal_embeds_per_batch (navila_arch.py:191-213)
        out_row = []
        for tok, lab in zip(id_row, lab_row):
            if tok == IMAGE_TOKEN_INDEX:
                out_row.extend([-100] * nt)
            else:
                out_row.append(lab)
        return out_row

    ids = jnp.asarray([expand(r, IMAGE_TOKEN_INDEX) for r in ids_ref])
    labels = jnp.asarray([
        expand_labels(ir, lr) for ir, lr in zip(ids_ref, labels_ref)
    ])
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)),
        "labels": labels,
    }
    loss, our_g = jax.jit(jax.value_and_grad(
        lambda p: navila_loss(p, cfg, batch,
                              soft_tokens=jnp.asarray(soft_ids))[0]
    ))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.llm.layers.1.mlp.down_proj.weight",
             ("vlm", "llm", "layers", "mlp", "down", "w"), 1),
            ("model.mm_projector.2.weight",
             ("vlm", "projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )
    # the reference ties lm_head to embed_tokens (outer-config
    # tie_word_embeddings=True), so its single grad is the SUM of our
    # separate input-embedding and lm-head grads
    tied = (_leaf(our_g, ("vlm", "llm", "embed", "embedding"))
            + _leaf(our_g, ("vlm", "llm", "lm_head", "w")).T)
    np.testing.assert_allclose(
        tied, ref_g["model.llm.embed_tokens.weight"], atol=ATOL)


# ---------------------------------------------------------------------------
# Hybrid CogACT: has_text/has_action mixed-batch gating — text CE over
# has_text rows (zeroed when none) + per-sample diffusion MSE weighted by
# has_action with a +1e-6 denominator (hybrid_cogact_arch.py:126-198)
# ---------------------------------------------------------------------------


def test_hybrid_cogact_training_parity(ref_env, clip_dir):
    from dexbotic.model.cogact.hybrid_cogact_arch import CogActConfig as RefCfg
    from dexbotic.model.cogact.hybrid_cogact_arch import HybridCogACTForCausalLM

    from dexbotic_tpu.models.cogact import CogActConfig, cogact_loss
    from dexbotic_tpu.utils.convert import attach_lm_head, convert_cogact

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="DiT-S",
        action_dim=7, chunk_size=4,
    )
    torch.manual_seed(71)
    ref = HybridCogACTForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(72)
    B, rep = 2, 4
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13],
                        [1, 5, IMAGE_TOKEN_INDEX, 21, 23, 2]])
    labels_ref = np.full_like(ids_ref, -100)
    labels_ref[:, 3:] = ids_ref[:, 3:]
    amask = np.ones((B, 6), bool)
    img = rs.randn(B, 3, 28, 28).astype(np.float32)
    actions = rs.randn(B, 6, 7).astype(np.float32)
    has_text = np.array([1.0, 0.0], np.float32)  # row 1 is action-only
    has_action = np.array([0.0, 1.0], np.float32)  # row 0 is text-only
    t_pin = rs.randint(0, 100, (B * rep,)).astype(np.int64)
    noise_pin = rs.randn(B * rep, 4, 7).astype(np.float32)

    orig_rl, orig_ri = torch.randn_like, torch.randint
    torch.randn_like = lambda x, **k: torch.tensor(noise_pin).to(x.dtype)
    torch.randint = lambda *a, **k: torch.tensor(t_pin)
    try:
        out = ref(
            input_ids=torch.tensor(ids_ref),
            attention_mask=torch.tensor(amask),
            images=torch.tensor(img),
            actions=torch.tensor(actions),
            labels=torch.tensor(labels_ref),
            has_text=torch.tensor(has_text),
            has_action=torch.tensor(has_action),
            repeated_diffusion_steps=rep,
        )
    finally:
        torch.randn_like, torch.randint = orig_rl, orig_ri
    out.loss.backward()

    GRAD_NAMES = [
        "model.llm.embed_tokens.weight",  # TIED to lm_head (outer config)
        "model.action_head.net.final_layer.linear.weight",
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.mm_projector.0.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())
    text_ref = float(out.text_loss.detach())
    action_ref = float(out.action_loss.detach())

    cfg = CogActConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="DiT-S", action_dim=7, chunk_size=4,
    )
    sd = _sd(ref)
    params = convert_cogact(sd, cfg)
    params["vlm"]["llm"] = attach_lm_head(params["vlm"]["llm"], sd)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([
        [1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13],
        [1, 5] + [IMAGE_TOKEN_INDEX] * nt + [21, 23, 2],
    ])
    labels = jnp.asarray([
        [1, 7] + [-100] * nt + [9, 11, 13],
        [1, 5] + [-100] * nt + [21, 23, 2],
    ])
    labels = labels.at[:, :2].set(-100)  # prompt region masked as in ref
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        "actions": jnp.asarray(actions),
        "labels": labels,
        "has_text": jnp.asarray(has_text),
        "has_action": jnp.asarray(has_action),
    }

    def loss_fn(p):
        loss, m = cogact_loss(
            p, cfg, batch, jax.random.PRNGKey(0), with_text_loss=True,
            diffusion_t=jnp.asarray(t_pin, jnp.int32),
            diffusion_noise=jnp.asarray(noise_pin),
        )
        return loss, m

    (loss, metrics), our_g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    np.testing.assert_allclose(float(metrics["text_loss"]), text_ref, atol=ATOL)
    np.testing.assert_allclose(float(metrics["action_loss"]), action_ref, atol=ATOL)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_head.net.final_layer.linear.weight",
             ("action_head", "final", "w"), None),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.mm_projector.0.weight",
             ("vlm", "projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )
    # tied lm_head/embed (see NaVILA test): ref grad = our embed + lm_head.T
    tied = (_leaf(our_g, ("vlm", "llm", "embed", "embedding"))
            + _leaf(our_g, ("vlm", "llm", "lm_head", "w")).T)
    np.testing.assert_allclose(
        tied, ref_g["model.llm.embed_tokens.weight"], atol=ATOL)


# ---------------------------------------------------------------------------
# pi0.5: adaRMS-gated flow-matching loss + grads (Beta time pinned;
# pi05_arch.py:129-151,293-332).  DM0-Prog's progress head is
# inference-only (dm0_prog_arch.py:4), so DM0's pin covers its training.
# ---------------------------------------------------------------------------


def test_pi05_training_parity(ref_env, siglip_dir):
    import dataclasses

    from dexbotic.model.pi05 import pi05_arch
    from dexbotic.model.pi05.transformers_pi05.gemma.configuration_gemma import (
        AdaRMSGemmaConfig,
    )

    from dexbotic_tpu.models.flow_vla import flow_vla_loss, pi05_config
    from dexbotic_tpu.utils.convert import convert_flow_vla

    pi05_arch.DynamicCache = CompatCache
    llm_cfg = AdaRMSGemmaConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=256, rms_norm_eps=1e-6,
        attention_dropout=0.0, tie_word_embeddings=True, use_adarms=False,
    )
    exp_cfg = AdaRMSGemmaConfig(
        vocab_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=64, max_position_embeddings=256, rms_norm_eps=1e-6,
        attention_dropout=0.0, use_adarms=True, adarms_cond_dim=32, width=32,
    )
    cfg_r = pi05_arch.Pi05Config(
        llm_config=llm_cfg, mm_vision_tower=siglip_dir, action_config=exp_cfg,
        mm_projector_type="linear", action_dim=8, chunk_size=5,
    )
    torch.manual_seed(73)
    ref = pi05_arch.Pi05ForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(74)
    B = 2
    ids = rs.randint(1, 500, (B, 6))
    amask = np.ones((B, 6), bool)
    images = rs.randn(B, 2, 3, 28, 28).astype(np.float32)
    image_masks = np.array([[True, True], [True, False]])
    actions = rs.randn(B, 5, 8).astype(np.float32)
    noise_pin = rs.randn(B, 5, 8).astype(np.float32)
    beta_pin = rs.beta(1.5, 1.0, (B,)).astype(np.float32)

    class _PinnedBeta:
        def __init__(self, *a, **k):
            pass

        def sample(self, shape):
            return torch.tensor(beta_pin[: shape[0]])

    orig_normal, orig_beta = torch.normal, torch.distributions.Beta
    torch.normal = lambda *a, **k: torch.tensor(noise_pin)
    torch.distributions.Beta = _PinnedBeta
    try:
        out = ref(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(amask),
            images=torch.tensor(images),
            image_masks=torch.tensor(image_masks),
            actions=torch.tensor(actions),
        )
    finally:
        torch.normal, torch.distributions.Beta = orig_normal, orig_beta
    out.loss.backward()

    GRAD_NAMES = [
        "model.action_out_proj.weight",
        "model.action_in_proj.weight",
        "model.time_mlp_in.weight",
        "model.action_expert.layers.0.self_attn.q_proj.weight",
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.mm_projector.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    expert = dataclasses.replace(GEMMA_EXPERT_T, adarms_cond_dim=32)
    cfg = pi05_config(GEMMA_T, expert, SIGLIP_T, action_dim=8, chunk_size=5,
                      projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(amask, jnp.int32),
        "images": jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        "image_masks": jnp.asarray(image_masks, jnp.int32),
        "actions": jnp.asarray(actions),
    }
    time_pin = beta_pin * 0.999 + 0.001

    def loss_fn(p):
        return flow_vla_loss(
            p, cfg, batch, jax.random.PRNGKey(0),
            noise=jnp.asarray(noise_pin), time=jnp.asarray(time_pin),
        )[0]

    loss, our_g = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.action_out_proj.weight", ("action_out_proj", "w"), None),
            ("model.action_in_proj.weight", ("action_in_proj", "w"), None),
            ("model.time_mlp_in.weight", ("time_mlp_in", "w"), None),
            ("model.action_expert.layers.0.self_attn.q_proj.weight",
             ("expert", "layers", "attn", "q", "w"), 0),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.mm_projector.weight",
             ("vlm", "projector", "fc", "w"), None),
        ],
        ref_g, our_g,
    )


# ---------------------------------------------------------------------------
# Discrete VLA: plain next-token CE over the action-string answer
# (DexboticForCausalLM.forward, dexbotic_arch.py:483-488)
# ---------------------------------------------------------------------------


def test_discrete_vla_training_parity(ref_env, clip_dir):
    from dexbotic.model.dexbotic_arch import DexboticConfig
    from dexbotic.model.discrete_vla.discrete_vla_arch import DiscreteVLAForCausalLM

    from dexbotic_tpu.models.discrete_vla import DiscreteVLAConfig, discrete_vla_loss
    from dexbotic_tpu.utils.convert import (
        attach_lm_head, convert_llm, convert_projector, convert_vit,
    )

    cfg_r = DexboticConfig(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu",
    )
    torch.manual_seed(75)
    ref = DiscreteVLAForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(76)
    B = 2
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13, 30, 40],
                        [1, 5, IMAGE_TOKEN_INDEX, 21, 23, 2, 50, 60]])
    labels_ref = np.full_like(ids_ref, -100)
    labels_ref[:, 4:] = ids_ref[:, 4:]
    amask = np.ones(ids_ref.shape, bool)
    img = rs.randn(B, 3, 28, 28).astype(np.float32)

    out = ref(
        input_ids=torch.tensor(ids_ref), attention_mask=torch.tensor(amask),
        images=torch.tensor(img), labels=torch.tensor(labels_ref),
    )
    out.loss.backward()

    GRAD_NAMES = [
        "model.llm.embed_tokens.weight",  # TIED to lm_head (outer config)
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.mm_projector.0.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    cfg = DiscreteVLAConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"))
    sd = _sd(ref)
    params = {"vlm": {
        "llm": attach_lm_head(
            convert_llm(sd, cfg.vlm.llm, prefix="model.llm."), sd),
        "vit": convert_vit(
            sd, cfg.vlm.vit,
            prefix="model.mm_vision_tower.vision_tower.vision_model."),
        "projector": convert_projector(
            sd, "mlp2x_gelu", prefix="model.mm_projector."),
    }}
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([
        [1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13, 30, 40],
        [1, 5] + [IMAGE_TOKEN_INDEX] * nt + [21, 23, 2, 50, 60],
    ])
    labels = jnp.asarray([
        [-100, -100] + [-100] * nt + [-100, 11, 13, 30, 40],
        [-100, -100] + [-100] * nt + [-100, 23, 2, 50, 60],
    ])
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        "labels": labels,
    }
    loss, our_g = jax.jit(jax.value_and_grad(
        lambda p: discrete_vla_loss(p, cfg, batch)[0]
    ))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("vlm", "llm", "layers", "attn", "q", "w"), 0),
            ("model.mm_projector.0.weight",
             ("vlm", "projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )
    tied = (_leaf(our_g, ("vlm", "llm", "embed", "embedding"))
            + _leaf(our_g, ("vlm", "llm", "lm_head", "w")).T)
    np.testing.assert_allclose(
        tied, ref_g["model.llm.embed_tokens.weight"], atol=ATOL)


# ---------------------------------------------------------------------------
# MUVLA: reward-weighted CE + expectile(0.9) reward regression
# (muvla_arch.py:554-592) — deterministic, no pins needed
# ---------------------------------------------------------------------------


def test_muvla_training_parity(ref_env, tmp_path):
    import dataclasses

    from transformers import CLIPImageProcessor, CLIPVisionConfig, CLIPVisionModel

    from dexbotic.model.muvla import muvla_arch

    from dexbotic_tpu.models.muvla import MUVLAConfig, fuse_obs_with_history, muvla_loss
    from dexbotic_tpu.utils.convert import convert_muvla

    # 48px/patch-2 -> a 24x24 = 576-token grid: the reference hardcodes
    # `reshape(B, T_hist * 576, -1)` for the history path
    # (muvla_arch.py:239-241, CLIP-L geometry), so the tiny tower must
    # emit exactly 576 patch tokens for the qformer leg to run unpatched.
    d = tmp_path / "tiny-clip64-vit"
    torch.manual_seed(77)
    CLIPVisionModel(CLIPVisionConfig(
        image_size=48, patch_size=2, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, projection_dim=64,
    )).save_pretrained(d)
    CLIPImageProcessor(crop_size=48, size=48).save_pretrained(d)
    llm_dir = tmp_path / "tiny-llama-cfg"
    _llama_hf().save_pretrained(llm_dir)

    cfg_r = muvla_arch.MUVLAConfig(
        llm_config=str(llm_dir), mm_vision_tower=str(d),
        obs_vision_tower=str(d), mm_projector_type="mlp2x_gelu",
    )
    torch.manual_seed(78)
    ref = muvla_arch.MUVLAForCausalLM(cfg_r).eval().float()
    # re-instantiate the fuser/qformer at the tiny tower width (the
    # reference hardcodes CLIP-L widths, muvla_arch.py:140-150)
    torch.manual_seed(79)
    ref.model.fuser = muvla_arch.CrossFuseReduce(inter_dim=64, fuse_len=1).float()
    ref.model.history_qformer = muvla_arch.SimpleQFormer(
        input_dim=64, hidden_dim=64, num_queries=8).float()

    clip64_t = dataclasses.replace(CLIP_T, hidden_size=64, intermediate_size=128,
                                   image_size=48, patch_size=2)
    cfg = MUVLAConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=clip64_t, projector_type="mlp2x_gelu"),
        obs_vit=clip64_t, inter_dim=64, num_history_queries=8,
    )
    params = convert_muvla(_sd(ref), cfg)

    rs = np.random.RandomState(80)
    B = 2
    map_img = rs.randn(B, 3, 48, 48).astype(np.float32)
    obs_img = rs.randn(B, 3, 48, 48).astype(np.float32)
    obs_hist = rs.randn(B, 3, 48, 48).astype(np.float32)
    reward = np.array([0.3, 0.8], np.float32)
    obs_stack = np.stack([obs_img, obs_hist], axis=1)  # current + 1 history

    # fused token count comes from our own helper; the reference expands its
    # single <image> placeholder to the same count
    tokens = fuse_obs_with_history(
        params, cfg,
        jnp.asarray(map_img.transpose(0, 2, 3, 1)),
        jnp.asarray(obs_stack.transpose(0, 1, 3, 4, 2)),
    )
    n_fused = tokens.shape[1]

    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13],
                        [1, 5, IMAGE_TOKEN_INDEX, 21, 23, 2]])
    labels_ref = np.full_like(ids_ref, -100)
    labels_ref[:, 3:] = ids_ref[:, 3:]
    amask = np.ones(ids_ref.shape, bool)
    # [B, 3, C, H, W]: images[:,0]=map, images[:,1]=obs current,
    # images[:,2]=obs history (muvla_arch.py:267-270)
    images = np.stack([map_img, obs_img, obs_hist], axis=1)

    out = ref(
        input_ids=torch.tensor(ids_ref), attention_mask=torch.tensor(amask),
        images=torch.tensor(images), labels=torch.tensor(labels_ref),
        reward=torch.tensor(reward),
    )
    out.loss.backward()

    GRAD_NAMES = [
        "reward_head.weight",
        "model.history_qformer.query_embeddings",
        "model.fuser.cross_attn.out_proj.weight",
        "model.llm.layers.0.self_attn.q_proj.weight",
        "model.mm_projector.0.weight",
    ]
    ref_g = _ref_grads(ref, GRAD_NAMES)
    loss_ref = float(out.loss.detach())

    ids = jnp.asarray([
        [1, 7] + [IMAGE_TOKEN_INDEX] * n_fused + [9, 11, 13],
        [1, 5] + [IMAGE_TOKEN_INDEX] * n_fused + [21, 23, 2],
    ])
    labels = jnp.asarray([
        [-100, -100] + [-100] * n_fused + [9, 11, 13],
        [-100, -100] + [-100] * n_fused + [21, 23, 2],
    ])
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "labels": labels,
        "map_images": jnp.asarray(map_img.transpose(0, 2, 3, 1)),
        "obs_images": jnp.asarray(obs_stack.transpose(0, 1, 3, 4, 2)),
        "reward": jnp.asarray(reward),
    }
    (loss, metrics), our_g = jax.jit(jax.value_and_grad(
        lambda p: muvla_loss(p, cfg, batch), has_aux=True
    ))(params)
    np.testing.assert_allclose(float(loss), loss_ref, atol=ATOL)
    _check_grads(
        [
            ("reward_head.weight", ("reward_head", "w"), None),
            ("model.fuser.cross_attn.out_proj.weight",
             ("fuser", "attn", "o", "w"), None),
            ("model.llm.layers.0.self_attn.q_proj.weight",
             ("llm", "layers", "attn", "q", "w"), 0),
            ("model.mm_projector.0.weight",
             ("projector", "fc0", "w"), None),
        ],
        ref_g, our_g,
    )
    # qformer queries: [Q, D] on both sides, no transpose
    np.testing.assert_allclose(
        _leaf(our_g, ("qformer", "queries")),
        ref_g["model.history_qformer.query_embeddings"], atol=ATOL)
