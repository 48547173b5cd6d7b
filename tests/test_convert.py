"""Weight-conversion parity: tiny HF torch models vs our implementations."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from dexbotic_tpu.nn.transformer import TransformerConfig, lm_logits, transformer_forward
from dexbotic_tpu.nn.vit import ViTConfig, vit_forward
from dexbotic_tpu.utils.convert import attach_lm_head, convert_llm, convert_vit


def _numpy_sd(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_dropout=0.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = TransformerConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=8, intermediate_size=64, rms_eps=1e-5, tie_embeddings=False,
        attn_impl="xla",
    )
    params = convert_llm(_numpy_sd(hf), cfg, prefix="model.")
    params = attach_lm_head(params, _numpy_sd(hf))

    ids = np.random.RandomState(0).randint(0, 128, (2, 10))
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()

    from dexbotic_tpu.nn.transformer import embed_tokens

    x = embed_tokens(params, cfg, jnp.asarray(ids))
    valid = jnp.ones((2, 10), jnp.int32)
    grp = jnp.cumsum(valid, 1)
    out, _ = transformer_forward(cfg, params, x, grp - 1, grp, valid)
    ours = np.asarray(lm_logits(params, cfg, out))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_qwen3_parity():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=8, intermediate_size=64, rms_eps=1e-6, rope_theta=1e6,
        qk_norm=True, tie_embeddings=False, attn_impl="xla",
    )
    params = convert_llm(_numpy_sd(hf), cfg, prefix="model.")
    params = attach_lm_head(params, _numpy_sd(hf))

    ids = np.random.RandomState(1).randint(0, 128, (2, 8))
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()

    from dexbotic_tpu.nn.transformer import embed_tokens

    x = embed_tokens(params, cfg, jnp.asarray(ids))
    valid = jnp.ones((2, 8), jnp.int32)
    grp = jnp.cumsum(valid, 1)
    out, _ = transformer_forward(cfg, params, x, grp - 1, grp, valid)
    ours = np.asarray(lm_logits(params, cfg, out))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_gemma_parity():
    from transformers import GemmaConfig, GemmaForCausalLM

    hf_cfg = GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=1, head_dim=8,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
    )
    torch.manual_seed(2)
    hf = GemmaForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=1,
        head_dim=8, intermediate_size=64, rms_eps=1e-6, act="gelu_tanh",
        norm_offset=1.0, embed_scale=True, tie_embeddings=True, attn_impl="xla",
        attn_scale=8**-0.5,
    )
    params = convert_llm(_numpy_sd(hf), cfg, prefix="model.")

    ids = np.random.RandomState(2).randint(0, 128, (1, 8))
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()

    from dexbotic_tpu.nn.transformer import embed_tokens

    x = embed_tokens(params, cfg, jnp.asarray(ids))
    valid = jnp.ones((1, 8), jnp.int32)
    grp = jnp.cumsum(valid, 1)
    out, _ = transformer_forward(cfg, params, x, grp - 1, grp, valid)
    ours = np.asarray(lm_logits(params, cfg, out))
    np.testing.assert_allclose(ours, hf_logits, rtol=3e-3, atol=3e-3)


def test_clip_vit_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
    )
    torch.manual_seed(3)
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = ViTConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=3, num_heads=4,
        intermediate_size=64, act="quick_gelu", ln_eps=1e-5, use_cls=True,
        pre_ln=True, select_layer=-2, drop_cls=True,
    )
    params = convert_vit(_numpy_sd(hf), cfg, prefix="vision_model.")

    imgs = np.random.RandomState(3).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(pixel_values=torch.tensor(imgs), output_hidden_states=True)
    expect = hf_out.hidden_states[-2].numpy()[:, 1:]  # select_layer=-2, drop CLS

    ours = np.asarray(vit_forward(params, cfg, jnp.asarray(imgs.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, expect, rtol=2e-3, atol=2e-3)


def test_siglip_vit_parity():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    torch.manual_seed(4)
    hf = SiglipVisionModel(hf_cfg).eval()
    cfg = ViTConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, act="gelu_tanh", ln_eps=1e-6, select_layer=None,
    )
    params = convert_vit(_numpy_sd(hf), cfg, prefix="vision_model.")

    imgs = np.random.RandomState(4).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        expect = hf(pixel_values=torch.tensor(imgs)).last_hidden_state.numpy()

    ours = np.asarray(vit_forward(params, cfg, jnp.asarray(imgs.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, expect, rtol=2e-3, atol=2e-3)


def test_llava_full_vlm_splice_parity():
    """Full VLM parity incl. the multimodal splice vs HF Llava — validates
    the static-shape splice formulation end-to-end (SURVEY §7 hard part #1)."""
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    vc = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14, hidden_act="quick_gelu",
    )
    tc = LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    cfg_hf = LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=120,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(5)
    hf = LlavaForConditionalGeneration(cfg_hf).eval()
    sd = _numpy_sd(hf)

    from dexbotic_tpu.models.vlm import VLMConfig, vlm_forward
    from dexbotic_tpu.nn.transformer import TransformerConfig, lm_logits
    from dexbotic_tpu.nn.vit import ViTConfig
    from dexbotic_tpu.utils.convert import attach_lm_head, convert_llm, convert_vit

    llm_cfg = TransformerConfig(
        vocab_size=128, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=12, intermediate_size=96, rms_eps=1e-5, tie_embeddings=False,
        attn_impl="xla",
    )
    vit_cfg = ViTConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, act="quick_gelu", ln_eps=1e-5, use_cls=True,
        pre_ln=True, select_layer=-2, drop_cls=True,
    )
    cfg = VLMConfig(llm=llm_cfg, vit=vit_cfg, projector_type="mlp2x_gelu")

    llm = convert_llm(sd, llm_cfg, prefix="model.language_model.")
    llm = attach_lm_head(llm, sd, "lm_head.weight")
    vit = convert_vit(sd, vit_cfg, prefix="model.vision_tower.vision_model.")
    proj = {
        "fc0": {
            "w": np.ascontiguousarray(sd["model.multi_modal_projector.linear_1.weight"].T),
            "b": sd["model.multi_modal_projector.linear_1.bias"],
        },
        "fc1": {
            "w": np.ascontiguousarray(sd["model.multi_modal_projector.linear_2.weight"].T),
            "b": sd["model.multi_modal_projector.linear_2.bias"],
        },
    }
    params = {"llm": llm, "vit": vit, "projector": proj}

    # prompt with 4 pre-expanded image tokens at index 120 (HF's convention
    # matches our static splice exactly)
    ids_np = np.array([[1, 120, 120, 120, 120, 5, 6, 7]])
    px = torch.randn(1, 3, 28, 28)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids_np), pixel_values=px).logits.numpy()

    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX

    ours_ids = np.where(ids_np == 120, IMAGE_TOKEN_INDEX, ids_np)
    imgs = jnp.asarray(px.numpy().transpose(0, 2, 3, 1))[:, None]
    hidden, _ = vlm_forward(
        params, cfg, jnp.asarray(ours_ids), jnp.ones_like(jnp.asarray(ours_ids)),
        images=imgs,
    )
    ours = np.asarray(lm_logits(llm, llm_cfg, hidden))
    np.testing.assert_allclose(ours, hf_logits, rtol=3e-3, atol=3e-3)
