"""Full-policy numerical parity against the reference's OWN torch code.

Unlike test_convert.py (per-submodule HF parity) and test_golden.py (our own
regression pins), these tests load the ACTUAL reference implementation from
/root/reference (read-only public content; executed, never copied), build
tiny-config models offline, convert the torch state_dict with utils/convert,
and assert chunk-level agreement of the end-to-end inference paths:

  * CogACT   — VLM prefill -> cognition feature -> CFG DDIM-10
               (/root/reference/dexbotic/model/cogact/cogact_arch.py:149-198)
  * pi0      — MoT prefill cache -> 10 Euler flow steps
               (/root/reference/dexbotic/model/pi0/pi0_arch.py:402-491)
  * pi0.5    — same with adaRMS gated residuals
               (/root/reference/dexbotic/model/pi05/pi05_arch.py:424-514)
  * OFT-L1   — in-sequence action queries + proprio + MLPResNet
               (/root/reference/dexbotic/model/oft/oft_arch.py:212-254)
  * MemVLA   — memory-conditioned DiT block parity
               (/root/reference/dexbotic/model/memvla/action_model/dit.py)

The reference's optional deps that aren't installed here (timm, diffusers,
loguru) are stubbed with minimal faithful shims; names its pi0.5 fork imports
from older HF gemma are injected.  Initial sampler noise is captured by
patching torch.randn/torch.normal and injected into our samplers via the
`noise=` argument, so eta=0 sampling is deterministic on both sides.
"""

import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.nn.transformer import TransformerConfig
from dexbotic_tpu.nn.vit import ViTConfig

REF = "/root/reference"
ATOL = 1e-3  # chunk-level agreement requirement (VERDICT item 2)


# ---------------------------------------------------------------------------
# Reference import environment
# ---------------------------------------------------------------------------


def _mod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _install_ref_env():
    import torch.nn as nn

    if "timm" not in sys.modules:
        tm, tmm, tmv = _mod("timm"), _mod("timm.models"), _mod("timm.models.vision_transformer")

        class Attention(nn.Module):
            """Faithful shim of timm's ViT Attention (fused qkv + proj)."""

            def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
                super().__init__()
                self.num_heads = num_heads
                self.head_dim = dim // num_heads
                self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
                self.proj = nn.Linear(dim, dim)

            def forward(self, x):
                B, N, C = x.shape
                qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
                q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
                x = torch.nn.functional.scaled_dot_product_attention(q, k, v)
                return self.proj(x.transpose(1, 2).reshape(B, N, C))

        class Mlp(nn.Module):
            def __init__(self, in_features, hidden_features=None, act_layer=nn.GELU, drop=0.0, **kw):
                super().__init__()
                self.fc1 = nn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = nn.Linear(hidden_features, in_features)

            def forward(self, x):
                return self.fc2(self.act(self.fc1(x)))

        tmv.Attention, tmv.Mlp = Attention, Mlp
        tm.models, tmm.vision_transformer = tmm, tmv
        sys.modules.update({"timm": tm, "timm.models": tmm, "timm.models.vision_transformer": tmv})

    if "diffusers" not in sys.modules:
        df, dfs, dfd = _mod("diffusers"), _mod("diffusers.schedulers"), _mod("diffusers.schedulers.scheduling_ddim")

        class DDIMScheduler:  # stub; add_noise is the faithful diffusers
            # squaredcos_cap_v2 forward process (the OFT DiT head's training
            # noising, action_model/model.py:220-246) so the training-parity
            # test can run it as the oracle
            def __init__(self, num_train_timesteps=1000, beta_schedule="linear", **kw):
                self.config = types.SimpleNamespace(num_train_timesteps=num_train_timesteps)
                import math

                T = num_train_timesteps
                ab = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2  # noqa: E731
                betas = [min(1 - ab((i + 1) / T) / ab(i / T), 0.999) for i in range(T)]
                self.alphas_cumprod = torch.cumprod(1.0 - torch.tensor(betas, dtype=torch.float64), dim=0)

            def add_noise(self, original_samples, noise, timesteps):
                ab = self.alphas_cumprod.to(original_samples.dtype)[timesteps]
                ab = ab.reshape((-1,) + (1,) * (original_samples.ndim - 1))
                return ab.sqrt() * original_samples + (1.0 - ab).sqrt() * noise

            def step(self, *a, **k):
                raise NotImplementedError("diffusers stub")

            def set_timesteps(self, *a, **k):
                raise NotImplementedError("diffusers stub")

        dfd.DDIMScheduler = DDIMScheduler
        df.schedulers, dfs.scheduling_ddim = dfs, dfd
        sys.modules.update({"diffusers": df, "diffusers.schedulers": dfs, "diffusers.schedulers.scheduling_ddim": dfd})

    if "deepspeed" not in sys.modules:
        # muvla_arch imports safe_get_full_fp32_param at module scope; the
        # tested modules never call it
        ds, dsu = _mod("deepspeed"), _mod("deepspeed.utils")
        dsu.safe_get_full_fp32_param = lambda p: p.data
        ds.utils = dsu
        sys.modules.update({"deepspeed": ds, "deepspeed.utils": dsu})

    if "loguru" not in sys.modules:
        lg = _mod("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        lg.logger = _Logger()
        sys.modules["loguru"] = lg

    # names the pi0.5 fork imports from HF gemma that moved in newer transformers
    import transformers.models.gemma.modeling_gemma as hf_gemma

    if not hasattr(hf_gemma, "AttentionMaskConverter"):
        from transformers.modeling_attn_mask_utils import AttentionMaskConverter

        hf_gemma.AttentionMaskConverter = AttentionMaskConverter
    if not hasattr(hf_gemma, "SequenceClassifierOutputWithPast"):
        from transformers.modeling_outputs import (
            SequenceClassifierOutputWithPast,
            TokenClassifierOutput,
        )

        hf_gemma.SequenceClassifierOutputWithPast = SequenceClassifierOutputWithPast
        hf_gemma.TokenClassifierOutput = TokenClassifierOutput
    if not hasattr(hf_gemma, "StaticCache"):
        from transformers.cache_utils import StaticCache

        hf_gemma.StaticCache = StaticCache
    if not hasattr(hf_gemma, "KwargsForCausalLM"):
        class KwargsForCausalLM(dict):
            pass

        hf_gemma.KwargsForCausalLM = KwargsForCausalLM

    if REF not in sys.path:
        sys.path.insert(0, REF)


class CompatCache:
    """transformers>=4.56 DynamicCache dropped .key_cache/.value_cache; the
    reference MoT code uses the old interface (pi0_arch.py:172-183)."""

    def __init__(self):
        self.key_cache, self.value_cache = [], []

    def update(self, k, v, idx):
        while len(self.key_cache) <= idx:
            self.key_cache.append(None)
            self.value_cache.append(None)
        if self.key_cache[idx] is None:
            self.key_cache[idx], self.value_cache[idx] = k, v
        else:
            self.key_cache[idx] = torch.cat([self.key_cache[idx], k], dim=-2)
            self.value_cache[idx] = torch.cat([self.value_cache[idx], v], dim=-2)
        return self.key_cache[idx], self.value_cache[idx]


@pytest.fixture(scope="module")
def ref_env():
    _install_ref_env()
    yield


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    """Tiny CLIP tower saved locally ('clip' in path drives the builder
    dispatch, mm_vision/builder.py:19)."""
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


# Tiny geometry shared by all tests (our side)
LLAMA_T = TransformerConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, rms_eps=1e-6, tie_embeddings=False,
    attn_impl="xla",
)
CLIP_T = ViTConfig(
    image_size=28, patch_size=14, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, act="quick_gelu", ln_eps=1e-5, use_cls=True,
    pre_ln=True, select_layer=-2, drop_cls=True,
)
GEMMA_T = TransformerConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, act="gelu_tanh", rope_theta=10000.0,
    rms_eps=1e-6, norm_offset=1.0, embed_scale=True, tie_embeddings=True,
    attn_impl="xla",
)
GEMMA_EXPERT_T = TransformerConfig(
    vocab_size=1, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=64, act="gelu_tanh", rope_theta=10000.0,
    rms_eps=1e-6, norm_offset=1.0, has_embed=False, attn_impl="xla",
)
SIGLIP_T = ViTConfig(
    image_size=28, patch_size=14, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, act="gelu_tanh", select_layer=-2,
)
IDENTITY_NORMS = {"min": [-1.0] * 8, "max": [1.0] * 8}


def _sd(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def _llama_hf():
    from transformers import LlamaConfig

    return LlamaConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_dropout=0.0,
    )


# ---------------------------------------------------------------------------
# CogACT
# ---------------------------------------------------------------------------


def test_cogact_full_policy_parity(ref_env, clip_dir):
    from dexbotic.model.cogact.cogact_arch import CogACTForCausalLM
    from dexbotic.model.cogact.cogact_arch import CogActConfig as RefCfg

    from dexbotic_tpu.models.cogact import CogActConfig, cogact_inference_action
    from dexbotic_tpu.models.vlm import VLMConfig
    from dexbotic_tpu.utils.convert import convert_cogact

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="DiT-S",
        action_dim=7, chunk_size=4,
    )
    torch.manual_seed(1)
    ref = CogACTForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(0)
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13]])
    img = rs.randn(1, 3, 28, 28).astype(np.float32)
    noise = rs.randn(1, 4, 7).astype(np.float32)

    orig = torch.randn
    torch.randn = lambda *s, **k: torch.tensor(noise)
    try:
        with torch.no_grad():
            acts_ref = np.array(
                ref.inference_action(
                    torch.tensor(ids_ref), torch.tensor(img),
                    inference_args={
                        "cfg_scale": 1.5, "num_ddim_steps": 10,
                        "action_norms": {"min": [-1.0] * 7, "max": [1.0] * 7},
                    },
                )
            )
    finally:
        torch.randn = orig

    cfg = CogActConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="DiT-S", action_dim=7, chunk_size=4,
    )
    params = convert_cogact(_sd(ref), cfg)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([[1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13]])
    out = cogact_inference_action(
        params, cfg, ids, jnp.ones(ids.shape, jnp.int32),
        jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        jax.random.PRNGKey(0), noise=jnp.asarray(noise),
    )
    ours = np.clip(np.asarray(out[0]), -1.0, 1.0)
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)


# ---------------------------------------------------------------------------
# pi0 / pi0.5
# ---------------------------------------------------------------------------


def _flow_inputs(action_dim=8, chunk=5):
    rs = np.random.RandomState(3)
    ids = rs.randint(1, 500, (1, 6))
    amask = np.ones((1, 6), bool)
    images = rs.randn(1, 2, 3, 28, 28).astype(np.float32)
    image_masks = np.array([[True, False]])
    states = rs.randn(1, action_dim).astype(np.float32)
    noise = rs.randn(1, chunk, action_dim).astype(np.float32)
    return ids, amask, images, image_masks, states, noise


def _run_ref_flow(ref, ids, amask, images, image_masks, states, noise):
    orig = torch.normal
    torch.normal = lambda *a, **k: torch.tensor(noise)
    try:
        with torch.no_grad():
            return ref.inference_action(
                torch.tensor(ids), torch.tensor(amask), torch.tensor(states),
                torch.tensor(images), torch.tensor(image_masks),
                diffusion_steps=10,
            ).numpy()
    finally:
        torch.normal = orig


def test_pi0_full_policy_parity(ref_env, siglip_dir):
    from transformers import GemmaConfig

    from dexbotic.model.pi0 import pi0_arch

    from dexbotic_tpu.models.flow_vla import flow_vla_inference_action, pi0_config
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
    torch.manual_seed(2)
    ref = pi0_arch.Pi0ForCausalLM(cfg_r).eval().float()

    ids, amask, images, image_masks, states, noise = _flow_inputs()
    acts_ref = _run_ref_flow(ref, ids, amask, images, image_masks, states, noise)

    cfg = pi0_config(GEMMA_T, GEMMA_EXPERT_T, SIGLIP_T, action_dim=8, chunk_size=5,
                     projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    out = flow_vla_inference_action(
        params, cfg, jnp.asarray(ids), jnp.asarray(amask, jnp.int32),
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(image_masks, jnp.int32), jnp.asarray(states),
        jax.random.PRNGKey(0), num_steps=10, noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(np.asarray(out), acts_ref, atol=ATOL)


def test_pi05_adarms_full_policy_parity(ref_env, siglip_dir):
    import dataclasses

    from dexbotic.model.pi05 import pi05_arch
    from dexbotic.model.pi05.transformers_pi05.gemma.configuration_gemma import (
        AdaRMSGemmaConfig,
    )

    from dexbotic_tpu.models.flow_vla import flow_vla_inference_action, pi05_config
    from dexbotic_tpu.utils.convert import convert_flow_vla

    pi05_arch.DynamicCache = CompatCache
    # production pi0.5 builds BOTH streams from the adaRMS fork; the LLM just
    # sets use_adarms=False (pi05/__init__.py registration + pi05_arch.py:151)
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
    torch.manual_seed(7)
    ref = pi05_arch.Pi05ForCausalLM(cfg_r).eval().float()

    ids, amask, images, image_masks, states, noise = _flow_inputs()
    acts_ref = _run_ref_flow(ref, ids, amask, images, image_masks, states, noise)

    expert = dataclasses.replace(GEMMA_EXPERT_T, adarms_cond_dim=32)
    cfg = pi05_config(GEMMA_T, expert, SIGLIP_T, action_dim=8, chunk_size=5,
                      projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    out = flow_vla_inference_action(
        params, cfg, jnp.asarray(ids), jnp.asarray(amask, jnp.int32),
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(image_masks, jnp.int32), None,
        jax.random.PRNGKey(0), num_steps=10, noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(np.asarray(out), acts_ref, atol=ATOL)


# ---------------------------------------------------------------------------
# OFT-L1
# ---------------------------------------------------------------------------


def test_oft_l1_full_policy_parity(ref_env, clip_dir):
    from dexbotic.model.oft.oft_arch import OFTForCausalLM
    from dexbotic.model.oft.oft_arch import OFTConfig as RefCfg

    from dexbotic_tpu.models.oft import OFTConfig, oft_inference_action
    from dexbotic_tpu.models.vlm import VLMConfig
    from dexbotic_tpu.utils.convert import convert_oft

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="Linear",
        action_dim=7, chunk_size=4, use_proprio=True, proprio_dim=9,
    )
    torch.manual_seed(11)
    ref = OFTForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(12)
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13]])
    img = rs.randn(1, 3, 28, 28).astype(np.float32)
    states = rs.randn(1, 9).astype(np.float32)
    with torch.no_grad():
        acts_ref = np.array(
            ref.inference_action(
                torch.tensor(ids_ref), torch.tensor(img),
                inference_args={
                    "action_norms": {"min": [-1.0] * 7, "max": [1.0] * 7},
                    "states": torch.tensor(states),
                },
            )
        )

    cfg = OFTConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="L1", action_dim=7, chunk_size=4,
        use_proprio=True, proprio_dim=9,
    )
    params = convert_oft(_sd(ref), cfg)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([[1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13]])
    out = oft_inference_action(
        params, cfg, ids, jnp.ones(ids.shape, jnp.int32),
        jnp.asarray(img.transpose(0, 2, 3, 1))[:, None], states=jnp.asarray(states),
    )
    ours = np.clip(np.asarray(out[0]), -1.0, 1.0)
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)


def test_oft_discrete_full_policy_parity(ref_env, clip_dir):
    """VERDICT r3 #3: bin-for-bin identical decode vs the reference's own
    parallel discrete decoding (oft_discrete_arch.py:207-235), INCLUDING its
    [-num_bins+1:] slice off-by-one (reference_parity=True default)."""
    from dexbotic.model.oft.oft_discrete_arch import (
        OFTDiscreteConfig as RefCfg,
        OFTDiscreteForCausalLM,
    )

    from dexbotic_tpu.models.oft import OFTConfig, oft_inference_action
    from dexbotic_tpu.models.vlm import VLMConfig
    from dexbotic_tpu.utils.convert import convert_oft

    num_bins = 64
    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="Discrete",
        action_dim=7, chunk_size=4, num_bins=num_bins,
    )
    torch.manual_seed(13)
    ref = OFTDiscreteForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(14)
    ids_ref = np.array([[1, 7, IMAGE_TOKEN_INDEX, 9, 11, 13]])
    img = rs.randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        acts_ref = np.array(
            ref.inference_action(
                torch.tensor(ids_ref), torch.tensor(img),
                inference_args={
                    "action_norms": {"min": [-1.0] * 7, "max": [1.0] * 7},
                },
            )
        )

    cfg = OFTConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="Discrete", action_dim=7, chunk_size=4,
        num_bins=num_bins, reference_parity=True,
    )
    params = convert_oft(_sd(ref), cfg)
    nt = cfg.vlm.num_image_tokens
    ids = jnp.asarray([[1, 7] + [IMAGE_TOKEN_INDEX] * nt + [9, 11, 13]])
    out = oft_inference_action(
        params, cfg, ids, jnp.ones(ids.shape, jnp.int32),
        jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
    )
    ours = np.asarray(out[0])
    # decoded continuous chunks agree ...
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)
    # ... and the underlying BIN IDS are identical (bin pitch 2/63 >> atol)
    to_bins = lambda a: np.round((a + 1.0) / 2.0 * (num_bins - 1)).astype(np.int64)
    np.testing.assert_array_equal(to_bins(ours), to_bins(acts_ref))

    # the corrected (opt-in) decode reads the full num_bins range: on the
    # same weights it must read one extra slot and generally shift bins
    import dataclasses as _dc

    cfg_fix = _dc.replace(cfg, reference_parity=False)
    out_fix = np.asarray(
        oft_inference_action(
            params, cfg_fix, ids, jnp.ones(ids.shape, jnp.int32),
            jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        )[0]
    )
    # Same vocab slot wins both decodes unless the extra (first) slot wins
    # the full range: then the full-decode bin is 0.  Everywhere else the
    # full-decode bin is exactly parity-bin + 1 (the documented shift).
    shift = to_bins(out_fix) - to_bins(ours)
    assert np.all((shift == 1) | (to_bins(out_fix) == 0))


# ---------------------------------------------------------------------------
# MemVLA memory-conditioned DiT + bank modules
# ---------------------------------------------------------------------------


def test_memvla_mem_dit_parity(ref_env):
    from dexbotic.model.memvla.action_model.action_models import (
        ActionModel as MemActionModel,
    )

    from dexbotic_tpu.models.dit import dit_forward, make_dit_config
    from dexbotic_tpu.nn import core
    from dexbotic_tpu.utils.convert import convert_dit

    torch.manual_seed(3)
    am = MemActionModel(
        token_size=64, model_type="DiT-S", in_channels=3,
        future_action_window_size=3, use_per_attn=True, per_token_size=16,
    ).eval().float()
    # randomize the reference's zero-inits so the comparison is discriminative
    with torch.no_grad():
        am.net.final_layer.linear.weight.normal_(0, 0.02)
        am.net.final_layer.linear.bias.normal_(0, 0.02)
        for blk in am.net.blocks:
            blk.per_attn.in_proj_weight.normal_(0, 0.05)
            blk.per_attn.in_proj_bias.normal_(0, 0.05)
            blk.per_attn.out_proj.weight.normal_(0, 0.05)
            blk.norm3.weight.normal_(1, 0.05)
            blk.norm3.bias.normal_(0, 0.05)

    cfg = make_dit_config("DiT-S", token_size=64, action_dim=3, chunk_size=4,
                          mem_cross_attn=True)
    sd = {("net." + k): v.detach().float().numpy() for k, v in am.net.state_dict().items()}
    p = convert_dit(sd, cfg, prefix="net.")

    rs = np.random.RandomState(4)
    x = rs.randn(2, 4, 3).astype(np.float32)
    t = np.array([50, 7])
    z = rs.randn(2, 1, 64).astype(np.float32)
    per = rs.randn(2, 6, 16).astype(np.float32)
    with torch.no_grad():
        out_ref = am.net(
            torch.tensor(x), torch.tensor(t), torch.tensor(z),
            per_token=torch.tensor(per),
        ).numpy()
    per_emb = core.linear(p["per_token_embedder"], jnp.asarray(per))
    out = dit_forward(p, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(z), mem=per_emb)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)


def test_memvla_bank_module_parity(ref_env):
    """SE bottleneck / cross block / gate / timestep embedder vs reference."""
    from dexbotic.model.memvla.memvla_arch import (
        BottleneckSE,
        CrossTransformerBlock,
        GateFusion,
        TimestepEmbedder,
    )

    from dexbotic_tpu.models.memvla import (
        cross_block_kv,
        gate_fusion,
        se_bottleneck,
        timestep_embed,
    )
    from dexbotic_tpu.utils.convert import _conv1x1, _convert_cross_block, _lin

    torch.manual_seed(21)
    rs = np.random.RandomState(22)

    # SE bottleneck (16 tokens -> 4x4 spatial grid inside the reference)
    se = BottleneckSE(32, 16).eval()
    x = rs.randn(2, 16, 32).astype(np.float32)
    with torch.no_grad():
        out_ref = se(torch.tensor(x)).numpy()
    sd = {k: v.detach().numpy() for k, v in se.state_dict().items()}
    p = {
        "excite": {"fc1": _conv1x1(sd, "excite.1"), "fc2": _conv1x1(sd, "excite.3")},
        "reduce": {"fc1": _conv1x1(sd, "reduce.0"), "fc2": _conv1x1(sd, "reduce.2")},
    }
    out = se_bottleneck(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)

    # Cross transformer block (separate K and V inputs, as retrieval uses)
    blk = CrossTransformerBlock(32, num_heads=4, dropout=0.0).eval()
    q = rs.randn(2, 3, 32).astype(np.float32)
    k = rs.randn(2, 5, 32).astype(np.float32)
    v = rs.randn(2, 5, 32).astype(np.float32)
    with torch.no_grad():
        out_ref = blk(torch.tensor(q), torch.tensor(k), torch.tensor(v)).numpy()
    sd = {k2: v2.detach().numpy() for k2, v2 in blk.state_dict().items()}
    p = _convert_cross_block(sd, "")
    out = cross_block_kv(
        p, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.ones((2, 5), jnp.int32), 4,
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)

    # Gate fusion
    gf = GateFusion(32).eval()
    a = rs.randn(2, 3, 32).astype(np.float32)
    b = rs.randn(2, 3, 32).astype(np.float32)
    with torch.no_grad():
        out_ref = gf(torch.tensor(a), torch.tensor(b)).numpy()
    sd = {k2: v2.detach().numpy() for k2, v2 in gf.state_dict().items()}
    out = gate_fusion({"proj": _lin(sd, "proj")}, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)

    # Timestep embedder
    te = TimestepEmbedder(32).eval()
    t = np.array([0.0, 3.0, 17.5], np.float32)
    with torch.no_grad():
        out_ref = te(torch.tensor(t)).numpy()
    sd = {k2: v2.detach().numpy() for k2, v2 in te.state_dict().items()}
    p = {"fc0": _lin(sd, "mlp.0"), "fc1": _lin(sd, "mlp.2")}
    out = timestep_embed(p, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)


# ---------------------------------------------------------------------------
# DM0 (Qwen3 pair: merged qk-norm attention, causal prefix, time-fused suffix;
# /root/reference/dexbotic/model/dm0/dm0_arch.py:108-268,514-641)
# ---------------------------------------------------------------------------


def test_dm0_full_policy_parity(ref_env, siglip_dir):
    import dataclasses

    from transformers import Qwen3Config

    from dexbotic.model.dm0 import dm0_arch

    from dexbotic_tpu.models.flow_vla import dm0_config, flow_vla_inference_action
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
    torch.manual_seed(13)
    ref = dm0_arch.DM0ForCausalLM(cfg_r).eval().float()

    ids, amask, images, image_masks, states, noise = _flow_inputs()
    acts_ref = _run_ref_flow(ref, ids, amask, images, image_masks, states, noise)

    qwen_t = dataclasses.replace(LLAMA_T, qk_norm=True)
    qwen_expert_t = dataclasses.replace(
        LLAMA_T, vocab_size=8, hidden_size=32, intermediate_size=64,
        qk_norm=True, has_embed=False,
    )
    cfg = dm0_config(qwen_t, qwen_expert_t, SIGLIP_T, action_dim=8, chunk_size=5,
                     projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    out = flow_vla_inference_action(
        params, cfg, jnp.asarray(ids), jnp.asarray(amask, jnp.int32),
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(image_masks, jnp.int32), None,
        jax.random.PRNGKey(0), num_steps=10, noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(np.asarray(out), acts_ref, atol=ATOL)


# ---------------------------------------------------------------------------
# MUVLA fusion modules + reward-weighted loss
# (/root/reference/dexbotic/model/muvla/muvla_arch.py:28-66,482,558-592)
# ---------------------------------------------------------------------------


def test_muvla_fusion_module_parity(ref_env):
    """CrossFuseReduce + SimpleQFormer vs the reference's own torch modules."""
    from dexbotic.model.muvla.muvla_arch import CrossFuseReduce, SimpleQFormer

    from dexbotic_tpu.models.muvla import _mha
    from dexbotic_tpu.nn import core
    from dexbotic_tpu.ops.norms import layer_norm
    from dexbotic_tpu.utils.convert import convert_muvla_fuser, convert_muvla_qformer

    torch.manual_seed(31)
    rs = np.random.RandomState(32)

    # CrossFuseReduce: obs tokens cross-attend into map tokens, residual + LN
    # (forward uses only cross_attn + ln; reduce/back_proj are dead params)
    fuser = CrossFuseReduce(inter_dim=64).eval()
    map_tk = rs.randn(2, 5, 64).astype(np.float32)
    obs_tk = rs.randn(2, 3, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = fuser(torch.tensor(map_tk), torch.tensor(obs_tk)).numpy()
    sd = {k: v.detach().numpy() for k, v in fuser.state_dict().items()}
    p = convert_muvla_fuser(sd, prefix="")
    fused = _mha(p["attn"], jnp.asarray(obs_tk), jnp.asarray(map_tk), 1)
    out = layer_norm(fused + jnp.asarray(obs_tk), p["ln"]["w"], p["ln"]["b"], eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)

    # SimpleQFormer: learned queries attend into projected history features
    qf = SimpleQFormer(input_dim=48, hidden_dim=64, num_queries=7).eval()
    feats = rs.randn(2, 9, 48).astype(np.float32)
    with torch.no_grad():
        ref_out = qf(torch.tensor(feats)).numpy()
    sd = {k: v.detach().numpy() for k, v in qf.state_dict().items()}
    p = convert_muvla_qformer(sd, prefix="")
    memory = core.linear(p["input_proj"], jnp.asarray(feats))
    queries = jnp.broadcast_to(jnp.asarray(p["queries"])[None], (2, 7, 64))
    out = _mha(p["attn"], queries, memory, 8)
    out = layer_norm(out, p["ln"]["w"], p["ln"]["b"], eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)


def test_muvla_loss_formula_parity(ref_env):
    """Our muvla_loss vs the reference's torch loss block applied to the SAME
    logits/hidden: shifted reward-weighted CE (1 + sigmoid(reward)) and
    expectile-0.9 reward MSE on the last hidden token, combined at 0.5x."""
    import torch.nn as nn

    from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
    from dexbotic_tpu.models.muvla import (
        MUVLAConfig, fuse_obs_with_history, init_muvla, muvla_loss,
    )
    from dexbotic_tpu.models.vlm import VLMConfig, splice_image_embeds, vlm_forward
    from dexbotic_tpu.nn import core
    from dexbotic_tpu.nn.transformer import lm_logits

    # inter_dim must equal the obs/map tower width (the reference fuses at
    # the shared 1024-dim tower width; here both tiny towers are 32)
    cfg = MUVLAConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=SIGLIP_T, projector_type="linear"),
        obs_vit=SIGLIP_T, inter_dim=32, num_history_queries=3, fuse_heads=1,
    )
    params = init_muvla(jax.random.PRNGKey(40), cfg)
    rs = np.random.RandomState(41)
    B, n_views, text = 2, 2, 5
    nf = cfg.num_fused_tokens(n_views)
    ids = rs.randint(1, 500, (B, nf + text))
    ids[:, :nf] = IMAGE_TOKEN_INDEX
    labels = np.full_like(ids, -100)
    labels[:, -3:] = rs.randint(1, 500, (B, 3))
    amask = np.ones_like(ids)
    map_imgs = rs.randn(B, 28, 28, 3).astype(np.float32)
    obs_imgs = rs.randn(B, n_views, 28, 28, 3).astype(np.float32)
    reward = rs.randn(B).astype(np.float32)
    batch = {
        "input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(amask),
        "labels": jnp.asarray(labels), "map_images": jnp.asarray(map_imgs),
        "obs_images": jnp.asarray(obs_imgs), "reward": jnp.asarray(reward),
    }
    loss, metrics = muvla_loss(params, cfg, batch)

    # recompute logits/hidden with the same forward pieces, then apply the
    # reference's loss lines in torch
    tokens = fuse_obs_with_history(params, cfg, batch["map_images"], batch["obs_images"])
    embeds = splice_image_embeds({"llm": params["llm"]}, cfg.vlm, batch["input_ids"], tokens)
    hidden, _ = vlm_forward(
        {"llm": params["llm"], "vit": params["vit"], "projector": params["projector"]},
        cfg.vlm, batch["input_ids"], batch["attention_mask"], inputs_embeds=embeds,
    )
    logits = np.asarray(lm_logits(params["llm"], cfg.vlm.llm, hidden), np.float32)

    logits_t = torch.tensor(logits)
    labels_t = torch.tensor(labels)
    shift_logits = logits_t[..., :-1, :].contiguous()
    shift_labels = labels_t[..., 1:].contiguous()
    ce = nn.CrossEntropyLoss(reduction="none")(
        shift_logits.view(-1, cfg.vlm.llm.vocab_size), shift_labels.view(-1)
    ).view(B, -1)
    m = (shift_labels != -100).float()
    per_sample = (ce * m).sum(dim=1) / m.sum(dim=1).clamp(min=1)
    weights = 1.0 + torch.sigmoid(torch.tensor(reward))
    text_loss_ref = (per_sample * weights).mean()

    pred = np.asarray(core.linear(params["reward_head"], hidden.astype(jnp.float32)))[..., 0]
    diff = torch.tensor(pred[:, -1]) - torch.tensor(reward)
    w = torch.where(diff < 0, 0.9, 1 - 0.9)
    total_ref = text_loss_ref + 0.5 * (w * diff**2).mean()

    np.testing.assert_allclose(float(loss), float(total_ref), atol=ATOL)
    np.testing.assert_allclose(float(metrics["text_loss"]), float(text_loss_ref), atol=ATOL)


# ---------------------------------------------------------------------------
# Converter unit coverage (ADVICE r1: linear projector crash)
# ---------------------------------------------------------------------------


def test_convert_projector_linear_roundtrip():
    from dexbotic_tpu.nn.projector import apply_projector
    from dexbotic_tpu.utils.convert import convert_projector

    rs = np.random.RandomState(0)
    w = rs.randn(64, 32).astype(np.float32)  # torch Linear [out, in]
    b = rs.randn(64).astype(np.float32)
    sd = {"mm_projector.weight": w, "mm_projector.bias": b}
    p = convert_projector(sd, "linear")
    x = rs.randn(2, 5, 32).astype(np.float32)
    out = np.asarray(apply_projector(p, jnp.asarray(x), "linear"))
    np.testing.assert_allclose(out, x @ w.T + b, rtol=1e-5, atol=1e-5)

    # Sequential-wrapped form keeps its bias
    sd2 = {"mm_projector.0.weight": w, "mm_projector.0.bias": b}
    p2 = convert_projector(sd2, "linear")
    assert "b" in p2["fc"]
    np.testing.assert_allclose(
        np.asarray(apply_projector(p2, jnp.asarray(x), "linear")),
        x @ w.T + b, rtol=1e-5, atol=1e-5,
    )

    # linear{N}x (bias-free by reference default)
    sd3 = {"mm_projector.weight": rs.randn(64, 96).astype(np.float32)}
    p3 = convert_projector(sd3, "linear3x")
    assert p3["fc"]["w"].shape == (96, 64) and "b" not in p3["fc"]
