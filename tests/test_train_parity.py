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

    loss, our_g = jax.value_and_grad(loss_fn)(params)
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

    loss, our_g = jax.value_and_grad(loss_fn)(params)
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
    loss, our_g = jax.value_and_grad(
        lambda p: oft_loss(p, cfg, batch, jax.random.PRNGKey(0))[0]
    )(params)
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
    loss, our_g = jax.value_and_grad(
        lambda p: oft_loss(
            p, cfg, batch, jax.random.PRNGKey(0),
            diffusion_t=jnp.asarray(t_pin, jnp.int32),
            diffusion_noise=jnp.asarray(noise_pin),
        )[0]
    )(params)
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
