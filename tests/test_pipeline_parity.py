"""Byte-level full-pipeline serving parity (VERDICT r3 #1).

The SAME PNG bytes + prompt string go through

  (a) the reference's OWN torch serving path — PIL decode,
      `process_images` (expand2square mean-fill + HF image processor),
      conversation template with the ``' '`` assistant stub,
      `tokenizer_image_token`, `inference_action`, `_denorm`
      (/root/reference/dexbotic/model/dexbotic_arch.py:498-563,
       exp/cogact_exp.py:145-188, exp/oft_exp.py:164-199) — and

  (b) OUR ACTUAL HTTP server (exp/serve.py) over a real socket: multipart
      POST -> cv2/PIL decode -> native pad+preprocess kernel -> template ->
      tokenize -> jitted inference -> numpy denorm -> JSON,

with one shared tokenizer, shared converted weights, shared sampler noise,
and non-identity norm stats; final DENORMED chunks agree <=1e-3.  This pins
every host-side serving stage, so real-checkpoint replay has no untested
step left.

The PNG is 20x28 (non-square, no resample: expand2square pads to 28x28 and
the 28-target resize is identity) so the pad-fill arithmetic and normalize
pipeline are exercised without coupling this assertion to the <=2-quanta
PIL-resize parity pinned separately in test_image_ops.py.
"""

import io
import json
import urllib.request

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
from PIL import Image

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.data.image_processing import CLIP_MEAN, CLIP_STD, ImageProcessorConfig
from dexbotic_tpu.exp import base_exp
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

NORMS = {"min": [-2.0, -1.0, -3.0, -0.5, -2.0, -1.5, 0.0],
         "max": [3.0, 1.0, 2.0, 0.5, 4.0, 1.5, 1.0]}
TEXT = "What action should the robot take to pick up the moka pot?"
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


def _png_bytes(seed: int, w: int = 20, h: int = 28) -> bytes:
    rs = np.random.RandomState(seed)
    buf = io.BytesIO()
    Image.fromarray(rs.randint(0, 256, (h, w, 3), np.uint8)).save(buf, "PNG")
    return buf.getvalue()


def _post(port: int, fields: dict, images: list) -> np.ndarray:
    boundary = "XBX"
    parts = []
    for name, val in fields.items():
        parts.append(
            (f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"'
             f"\r\n\r\n{val}\r\n").encode()
        )
    for i, img in enumerate(images):
        parts.append(
            (f'--{boundary}\r\nContent-Disposition: form-data; name="image"; '
             f'filename="f{i}.png"\r\nContent-Type: image/png\r\n\r\n').encode()
            + img + b"\r\n"
        )
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/process_frame", data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return np.asarray(json.loads(r.read()))


def _tiny_exp(exp_cls, model_cfg, max_len=256):
    return exp_cls(
        model=model_cfg,
        tokenizer=base_exp.TokenizerConfig(model_max_length=max_len),
        data=base_exp.DataConfig(
            image_processor=ImageProcessorConfig(size=28, mean=CLIP_MEAN, std=CLIP_STD),
            aug_policy=None,
        ),
        # the benchmark client sends the already-templated question; the
        # server only prepends '<image>\n' (reference serving semantics)
        action=base_exp.ActionConfig(prompt_template=""),
    )


def _ref_serving_ids(tokenizer, text: str, stub=" "):
    """The reference's serving-side prompt construction, using ITS functions."""
    from dexbotic.tokenization import conversation as ref_conv
    from dexbotic.tokenization.tokenization import tokenizer_image_token as ref_tit

    conv = ref_conv.conv_templates["dexbotic"].copy()
    conv.append_message(conv.roles[0], "<image>\n" + text)
    conv.append_message(conv.roles[1], stub)
    return ref_tit(conv.get_prompt(), tokenizer, IMAGE_TOKEN_INDEX,
                   return_tensors="pt").unsqueeze(0)


# ---------------------------------------------------------------------------
# CogACT
# ---------------------------------------------------------------------------


def test_cogact_bytes_to_actions_parity(ref_env, clip_dir):
    from dexbotic.model.cogact.cogact_arch import CogACTForCausalLM
    from dexbotic.model.cogact.cogact_arch import CogActConfig as RefCfg

    from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
    from dexbotic_tpu.exp.serve import CogActServer
    from dexbotic_tpu.models.cogact import CogActConfig, cogact_inference_action
    from dexbotic_tpu.utils.convert import convert_cogact

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="DiT-S",
        action_dim=7, chunk_size=4,
    )
    torch.manual_seed(21)
    ref = CogACTForCausalLM(cfg_r).eval().float()

    exp = _tiny_exp(CogActExp, CogActModelConfig(
        llm_preset="test", vit_preset="test", action_model_type="DiT-S",
        action_dim=7, chunk_size=4,
    ))
    tokenizer = exp.tokenizer.build_tokenizer()
    cfg = CogActConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="DiT-S", action_dim=7, chunk_size=4,
    )
    params = convert_cogact(_sd(ref), cfg)

    png = _png_bytes(7)
    noise = np.random.RandomState(8).randn(1, 4, 7).astype(np.float32)

    # (a) reference torch path: bytes -> actions, via ITS own functions
    pil = Image.open(io.BytesIO(png)).convert("RGB")
    image_tensor = ref.process_images([pil]).to(dtype=ref.dtype)
    input_ids = _ref_serving_ids(tokenizer, TEXT)
    orig = torch.randn
    torch.randn = lambda *s, **k: torch.tensor(noise)
    try:
        with torch.no_grad():
            acts_ref = np.array(ref.inference_action(
                input_ids, image_tensor,
                inference_args={"cfg_scale": 1.5, "num_ddim_steps": 10,
                                "action_norms": NORMS},
            ))
    finally:
        torch.randn = orig

    # (b) our HTTP server on a real socket, same bytes, pinned noise
    srv = CogActServer(exp, cfg, params, tokenizer, NORMS,
                       host="127.0.0.1", port=0)
    fn = jax.jit(lambda p, ids, valid, imgs, r: cogact_inference_action(
        p, cfg, ids, valid, imgs, r, noise=jnp.asarray(noise)))
    srv.infer = lambda ids, valid, imgs, r: fn(params, ids, valid, imgs, r)
    httpd = srv.serve_background()
    try:
        ours = _post(httpd.server_address[1], {"text": TEXT}, [png])
    finally:
        httpd.shutdown()
    assert ours.shape == acts_ref.shape == (4, 7)
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)


# ---------------------------------------------------------------------------
# OFT (L1 + proprio states, and Discrete parallel decode)
# ---------------------------------------------------------------------------


def test_oft_l1_bytes_to_actions_parity(ref_env, clip_dir):
    from dexbotic.model.oft.oft_arch import OFTForCausalLM
    from dexbotic.model.oft.oft_arch import OFTConfig as RefCfg

    from dexbotic_tpu.exp.oft_exp import OFTExp, OFTModelConfig
    from dexbotic_tpu.exp.serve import OFTServer
    from dexbotic_tpu.models.oft import OFTConfig
    from dexbotic_tpu.utils.convert import convert_oft

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="Linear",
        action_dim=7, chunk_size=4, use_proprio=True, proprio_dim=9,
    )
    torch.manual_seed(22)
    ref = OFTForCausalLM(cfg_r).eval().float()

    exp = _tiny_exp(OFTExp, OFTModelConfig(
        llm_preset="test", vit_preset="test", action_model_type="L1",
        action_dim=7, chunk_size=4, use_proprio=True, proprio_dim=9,
    ))
    tokenizer = exp.tokenizer.build_tokenizer()
    cfg = OFTConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="L1", action_dim=7, chunk_size=4,
        use_proprio=True, proprio_dim=9,
    )
    params = convert_oft(_sd(ref), cfg)

    png = _png_bytes(9)
    states = np.round(np.random.RandomState(10).randn(9), 4).tolist()

    pil = Image.open(io.BytesIO(png)).convert("RGB")
    image_tensor = ref.process_images([pil]).to(dtype=ref.dtype)
    input_ids = _ref_serving_ids(tokenizer, TEXT)
    with torch.no_grad():
        acts_ref = np.array(ref.inference_action(
            input_ids, image_tensor,
            inference_args={
                "action_norms": NORMS,
                # oft_exp.py:193-196: states arrive as a json string ->
                # torch tensor reshaped (1, -1)
                "states": torch.tensor(states, dtype=ref.dtype).reshape(1, -1),
            },
        ))

    srv = OFTServer(exp, cfg, params, tokenizer, NORMS, host="127.0.0.1", port=0)
    httpd = srv.serve_background()
    try:
        ours = _post(httpd.server_address[1],
                     {"text": TEXT, "states": json.dumps(states)}, [png])
    finally:
        httpd.shutdown()
    assert ours.shape == acts_ref.shape == (4, 7)
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)


def test_oft_discrete_bytes_to_actions_parity(ref_env, clip_dir):
    """Bin decode is exact integer arithmetic: the served chunk must match
    the reference's BIT-FOR-BIT after denorm (bin pitch >> atol)."""
    from dexbotic.model.oft.oft_discrete_arch import (
        OFTDiscreteConfig as RefCfg,
        OFTDiscreteForCausalLM,
    )

    from dexbotic_tpu.exp.oft_exp import OFTExp, OFTModelConfig
    from dexbotic_tpu.exp.serve import OFTServer
    from dexbotic_tpu.models.oft import OFTConfig
    from dexbotic_tpu.utils.convert import convert_oft

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="Discrete",
        action_dim=7, chunk_size=4, num_bins=64,
    )
    torch.manual_seed(23)
    ref = OFTDiscreteForCausalLM(cfg_r).eval().float()

    exp = _tiny_exp(OFTExp, OFTModelConfig(
        llm_preset="test", vit_preset="test", action_model_type="Discrete",
        action_dim=7, chunk_size=4, num_bins=64,
    ))
    tokenizer = exp.tokenizer.build_tokenizer()
    cfg = OFTConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="Discrete", action_dim=7, chunk_size=4, num_bins=64,
    )
    params = convert_oft(_sd(ref), cfg)

    png = _png_bytes(11)
    pil = Image.open(io.BytesIO(png)).convert("RGB")
    image_tensor = ref.process_images([pil]).to(dtype=ref.dtype)
    input_ids = _ref_serving_ids(tokenizer, TEXT)
    with torch.no_grad():
        acts_ref = np.array(ref.inference_action(
            input_ids, image_tensor, inference_args={"action_norms": NORMS},
        ))

    srv = OFTServer(exp, cfg, params, tokenizer, NORMS, host="127.0.0.1", port=0)
    httpd = srv.serve_background()
    try:
        ours = _post(httpd.server_address[1], {"text": TEXT}, [png])
    finally:
        httpd.shutdown()
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)


# ---------------------------------------------------------------------------
# pi0 (flow matching; mean/std state norm + AbsoluteAction output transform)
# ---------------------------------------------------------------------------


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


class _SpShim:
    """sentencepiece-call surface over SimpleTokenizer so the REFERENCE's
    Pi0Tokenization (tokenization/process.py:116-127) runs unmodified with
    the shared tiny tokenizer (sp.encode defaults add_bos=False)."""

    def __init__(self, tok):
        self._tok = tok

    def encode(self, text, add_bos=False):
        return self._tok.encode(text, add_bos=add_bos)


def test_pi0_bytes_to_actions_parity(ref_env, siglip_dir):
    """The full reference pi0 serving recipe (exp/pi0_exp.py:343-514) — its
    Pi0Tokenization, process_images + zero-view padding, PadState+ActionNorm
    (mean/std) input transform, inference_action, ActionDenorm+AbsoluteAction
    (non_delta_mask=[6]) output transform, [..., :7] slice — against our HTTP
    FlowVLAServer end-to-end on the same PNG bytes / prompt / states JSON."""
    import dataclasses

    from dexbotic.data.dataset.transform.action import ActionNorm, PadState
    from dexbotic.data.dataset.transform.common import Pipeline, ToNumpy, ToTensor
    from dexbotic.data.dataset.transform.output import AbsoluteAction, ActionDenorm
    from dexbotic.model.pi0 import pi0_arch
    from dexbotic.tokenization.process import Pi0Tokenization as RefPi0Tok
    from transformers import GemmaConfig

    from dexbotic_tpu.data.image_processing import ImageProcessorConfig
    from dexbotic_tpu.exp.pi0_exp import FlowModelConfig, Pi0Exp
    from dexbotic_tpu.exp.serve import FlowVLAServer
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
    torch.manual_seed(31)
    ref = pi0_arch.Pi0ForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(12)
    norms = {
        "action": {"mean": rs.randn(8).round(3).tolist(),
                   "std": (rs.rand(8) + 0.5).round(3).tolist()},
        "state": {"mean": rs.randn(8).round(3).tolist(),
                  "std": (rs.rand(8) + 0.5).round(3).tolist()},
    }
    states = rs.randn(6).round(3).tolist()  # 6-dim env state, padded to 8
    png = _png_bytes(13, w=28, h=28)  # square: resize identity, no resample
    noise = rs.randn(1, 5, 8).astype(np.float32)

    # --- (a) reference torch serving path, its own transforms throughout
    exp = Pi0Exp(
        model=FlowModelConfig(
            llm_preset="test", expert_preset="test", vit_preset="test",
            action_dim=8, chunk_size=5,
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=48),
    )
    exp.data = dataclasses.replace(
        exp.data, num_images=3, image_processor=ImageProcessorConfig(size=28),
        aug_policy=None,
    )
    exp.inference_cfg = dataclasses.replace(
        exp.inference_cfg, action_dim_out=7, non_delta_mask=[6],
    )
    tokenizer = exp.tokenizer.build_tokenizer()
    tokenizer.sp_model = _SpShim(tokenizer)

    pil = Image.open(io.BytesIO(png)).convert("RGB")
    img = ref.process_images([pil]).to(dtype=ref.dtype)
    img = torch.cat([img, torch.zeros_like(img[0:1]).repeat(2, 1, 1, 1)], dim=0)
    image_masks = torch.tensor([True, False, False])[None]
    ref_ids = np.array([RefPi0Tok(tokenizer)([{"value": TEXT}])["input_ids"]])
    amask = np.array(ref_ids != tokenizer.pad_token_id)
    st = np.asarray(json.loads(json.dumps(states)), np.float64)[None]

    # the reference's read_normalization_stats runs ToNumpy() over the stats
    norms_np = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
                for k, v in norms.items()}
    in_pipe = Pipeline([PadState(ndim=8, axis=-1),
                        ActionNorm(statistic_mapping=norms_np, strict=False),
                        ToTensor()])
    out_pipe = Pipeline([ToNumpy(),
                         ActionDenorm(statistic_mapping=norms_np, strict=False),
                         AbsoluteAction()])
    inputs = in_pipe({
        "input_ids": ref_ids, "attention_mask": amask, "state": st,
        "images": img[None], "image_masks": image_masks,
        "meta_data": {"non_delta_mask": np.array([6])},
    })
    orig = torch.normal
    torch.normal = lambda *a, **k: torch.tensor(noise)
    try:
        with torch.no_grad():
            acts = ref.inference_action(
                input_ids=inputs["input_ids"], attention_mask=inputs["attention_mask"],
                states=inputs["state"].float(), images=inputs["images"].float(),
                image_masks=inputs["image_masks"], diffusion_steps=10,
            )
    finally:
        torch.normal = orig
    outputs = {k: v.detach().cpu().numpy() if isinstance(v, torch.Tensor) else v
               for k, v in inputs.items()}  # ref pi0_exp.py:507-511
    outputs["action"] = acts.detach().cpu().numpy()
    acts_ref = np.asarray(out_pipe(outputs)["action"])[0, ..., :7]

    # --- (b) our HTTP server, same bytes/prompt/states, pinned noise
    cfg = pi0_config(GEMMA_T, GEMMA_EXPERT_T, SIGLIP_T, action_dim=8,
                     chunk_size=5, projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    srv = FlowVLAServer(exp, cfg, params, tokenizer, norms,
                        host="127.0.0.1", port=0)
    fn = jax.jit(lambda p, ids, mask, imgs, imasks, s, r: flow_vla_inference_action(
        p, cfg, ids, mask, imgs, imasks, s, r, num_steps=10,
        noise=jnp.asarray(noise)))
    srv.infer = lambda ids, mask, imgs, imasks, s, r: fn(
        params, ids, mask, imgs, imasks, s, r)
    httpd = srv.serve_background()
    try:
        ours = np.asarray(_post(
            httpd.server_address[1],
            {"text": TEXT, "states": json.dumps(states)}, [png],
        ))
    finally:
        httpd.shutdown()
    assert ours.shape == acts_ref.shape == (5, 7)
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)


# ---------------------------------------------------------------------------
# MemVLA (stateful episode: bank reset protocol + ToMe consolidation e2e)
# ---------------------------------------------------------------------------


def test_memvla_bytes_to_actions_episode_parity(ref_env, clip_dir):
    """SIX frames of one episode (mem_length=4, so ToMe consolidation fires
    on frames 5-6) through (a) the reference's stateful serving recipe —
    conversation template + tokenizer_image_token + inference_action with
    episode_first_frame reset (memvla_exp.py:318-357, memvla_arch.py:667-745)
    — and (b) our MemVLAServer over HTTP, same bytes, pinned noise.  Every
    frame's denormed chunk must agree, which pins the cross-request memory
    state as well as the host path."""
    from dexbotic.model.memvla.memvla_arch import MemVLAConfig as RefCfg
    from dexbotic.model.memvla.memvla_arch import MemVLAForCausalLM

    from dexbotic_tpu.exp.memvla_exp import MemVLAExp, MemVLAModelConfig
    from dexbotic_tpu.exp.serve import MemVLAServer
    from dexbotic_tpu.models.memvla import MemVLAConfig, memvla_inference_action
    from dexbotic_tpu.utils.convert import convert_memvla

    cfg_r = RefCfg(
        llm_config=_llama_hf(), mm_vision_tower=clip_dir,
        mm_projector_type="mlp2x_gelu", action_model_type="DiT-S",
        action_dim=7, chunk_size=4, per_token_size=16, mem_length=4,
        retrieval_layers=2, use_timestep_pe=True, fusion_type="gate",
        consolidate_type="tome", update_fused=True,
        dataloader_type="parallel_stream", group_size=2,
    )
    torch.manual_seed(33)
    ref = MemVLAForCausalLM(cfg_r).eval().float()
    # the reference feeds dropout_p=0.1 straight into F.scaled_dot_product_
    # attention (memvla_arch.py:122-124), which ignores eval() — its serving
    # retrieval is stochastic.  Zero it for a deterministic comparison; our
    # implementation has no inference dropout.
    for blocks in ref.model.per_cog_mem_bank.retrieval_blocks.values():
        for blk in blocks:
            blk.dropout = 0.0

    exp = _tiny_exp(MemVLAExp, MemVLAModelConfig(
        llm_preset="test", vit_preset="test", action_model_type="DiT-S",
        action_dim=7, chunk_size=4, per_token_size=16, mem_length=4,
    ))
    tokenizer = exp.tokenizer.build_tokenizer()
    cfg = MemVLAConfig(
        vlm=VLMConfig(llm=LLAMA_T, vit=CLIP_T, projector_type="mlp2x_gelu"),
        action_model_type="DiT-S", action_dim=7, chunk_size=4,
        per_token_size=16, mem_length=4,
    )
    params = convert_memvla(_sd(ref), cfg)

    frames = [_png_bytes(40 + i) for i in range(6)]
    noise = np.random.RandomState(41).randn(1, 4, 7).astype(np.float32)

    # (a) reference stateful loop, its own functions
    ref_chunks = []
    orig = torch.randn
    torch.randn = lambda *s, **k: torch.tensor(noise)
    try:
        with torch.no_grad():
            for i, png in enumerate(frames):
                pil = Image.open(io.BytesIO(png)).convert("RGB")
                img_t = ref.process_images([pil]).to(dtype=ref.dtype)
                ids = _ref_serving_ids(tokenizer, TEXT)
                ref_chunks.append(np.array(ref.inference_action(
                    ids, img_t,
                    episode_first_frame="True" if i == 0 else "False",
                    inference_args={"cfg_scale": 1.5, "num_ddim_steps": 10,
                                    "action_norms": NORMS},
                )))
    finally:
        torch.randn = orig

    # (b) our HTTP server, same bytes, pinned noise on the session program
    srv = MemVLAServer(exp, cfg, params, tokenizer, NORMS,
                       host="127.0.0.1", port=0)

    @jax.jit
    def pinned(params, ids, valid, images, state, t, rng):
        return memvla_inference_action(
            params, cfg, ids, valid, images, state, t, rng,
            noise=jnp.asarray(noise))

    srv.session._infer = pinned
    httpd = srv.serve_background()
    try:
        ours = [
            _post(httpd.server_address[1],
                  {"text": TEXT,
                   "episode_first_frame": "True" if i == 0 else "False"},
                  [png])
            for i, png in enumerate(frames)
        ]
    finally:
        httpd.shutdown()
    for i, (a, b) in enumerate(zip(ours, ref_chunks)):
        assert a.shape == b.shape == (4, 7), (i, a.shape, b.shape)
        # the randomly-initialized retrieval stack is chaotically sensitive
        # (measured: a 1e-4 input perturbation moves its output by ~0.3), so
        # fp accumulation in the bank compounds across frames; once ToMe
        # merges fire (frames 4-5) a few-1e-2 drift is numeric, not
        # structural (merge choices and shapes still agree).
        np.testing.assert_allclose(a, b, atol=ATOL if i < 4 else 5e-2,
                                    err_msg=f"frame {i}")


# ---------------------------------------------------------------------------
# pi0.5 (adaRMS gated residuals; quantile norms — VERDICT r4 #5)
# ---------------------------------------------------------------------------


def test_pi05_bytes_to_actions_parity(ref_env, siglip_dir):
    """The reference pi0.5 serving recipe (exp/pi05_exp.py:96-137) — its
    Pi0Tokenization, view padding, PadState+ActionNorm(use_quantiles=True),
    Pi05ForCausalLM.inference_action (adaRMS expert), ActionDenorm(quantiles)
    +AbsoluteAction — against our FlowVLAServer (Pi05Exp) end-to-end."""
    import dataclasses

    from dexbotic.data.dataset.transform.action import ActionNorm, PadState
    from dexbotic.data.dataset.transform.common import Pipeline, ToNumpy, ToTensor
    from dexbotic.data.dataset.transform.output import AbsoluteAction, ActionDenorm
    from dexbotic.model.pi05 import pi05_arch
    from dexbotic.model.pi05.transformers_pi05.gemma.configuration_gemma import (
        AdaRMSGemmaConfig,
    )
    from dexbotic.tokenization.process import Pi0Tokenization as RefPi0Tok

    from dexbotic_tpu.data.image_processing import ImageProcessorConfig
    from dexbotic_tpu.exp.pi0_exp import FlowModelConfig, Pi05Exp
    from dexbotic_tpu.exp.serve import FlowVLAServer
    from dexbotic_tpu.models.flow_vla import flow_vla_inference_action, pi05_config
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
    torch.manual_seed(51)
    ref = pi05_arch.Pi05ForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(52)
    # quantile stats use min/max keys (ActionNorm use_quantiles, action.py:272)
    norms = {
        "action": {"min": (-1 - rs.rand(8)).round(3).tolist(),
                   "max": (1 + rs.rand(8)).round(3).tolist()},
        "state": {"min": (-2 - rs.rand(8)).round(3).tolist(),
                  "max": (2 + rs.rand(8)).round(3).tolist()},
    }
    states = rs.randn(6).round(3).tolist()
    png = _png_bytes(53, w=28, h=28)
    noise = rs.randn(1, 5, 8).astype(np.float32)

    exp = Pi05Exp(
        model=FlowModelConfig(
            variant="pi05", llm_preset="test", expert_preset="test_adarms",
            vit_preset="test", action_dim=8, chunk_size=5,
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=48),
    )
    exp.data = dataclasses.replace(
        exp.data, num_images=3, image_processor=ImageProcessorConfig(size=28),
        aug_policy=None,
    )
    exp.inference_cfg = dataclasses.replace(
        exp.inference_cfg, action_dim_out=7, non_delta_mask=[6],
    )
    assert exp.action.use_quantiles  # pi05 serving is quantile-normalized
    tokenizer = exp.tokenizer.build_tokenizer()
    tokenizer.sp_model = _SpShim(tokenizer)

    # --- (a) reference torch serving path
    pil = Image.open(io.BytesIO(png)).convert("RGB")
    img = ref.process_images([pil]).to(dtype=ref.dtype)
    img = torch.cat([img, torch.zeros_like(img[0:1]).repeat(2, 1, 1, 1)], dim=0)
    image_masks = torch.tensor([True, False, False])[None]
    ref_ids = np.array([RefPi0Tok(tokenizer)([{"value": TEXT}])["input_ids"]])
    amask = np.array(ref_ids != tokenizer.pad_token_id)
    st = np.asarray(json.loads(json.dumps(states)), np.float64)[None]
    norms_np = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
                for k, v in norms.items()}
    in_pipe = Pipeline([PadState(ndim=8, axis=-1),
                        ActionNorm(statistic_mapping=norms_np, strict=False,
                                   use_quantiles=True),
                        ToTensor()])
    out_pipe = Pipeline([ToNumpy(),
                         ActionDenorm(statistic_mapping=norms_np, strict=False,
                                      use_quantiles=True),
                         AbsoluteAction()])
    inputs = in_pipe({
        "input_ids": ref_ids, "attention_mask": amask, "state": st,
        "images": img[None], "image_masks": image_masks,
        "meta_data": {"non_delta_mask": np.array([6])},
    })
    orig = torch.normal
    torch.normal = lambda *a, **k: torch.tensor(noise)
    try:
        with torch.no_grad():
            acts = ref.inference_action(
                input_ids=inputs["input_ids"], attention_mask=inputs["attention_mask"],
                states=inputs["state"].float(), images=inputs["images"].float(),
                image_masks=inputs["image_masks"], diffusion_steps=10,
            )
    finally:
        torch.normal = orig
    outputs = {k: v.detach().cpu().numpy() if isinstance(v, torch.Tensor) else v
               for k, v in inputs.items()}
    outputs["action"] = acts.detach().cpu().numpy()
    acts_ref = np.asarray(out_pipe(outputs)["action"])[0, ..., :7]

    # --- (b) our HTTP server
    import dataclasses as dc

    from test_policy_parity import GEMMA_EXPERT_T as _EXP

    cfg = pi05_config(GEMMA_T, dc.replace(_EXP, adarms_cond_dim=32), SIGLIP_T,
                      action_dim=8, chunk_size=5, projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    srv = FlowVLAServer(exp, cfg, params, tokenizer, norms,
                        host="127.0.0.1", port=0)
    fn = jax.jit(lambda p, ids, mask, imgs, imasks, s, r: flow_vla_inference_action(
        p, cfg, ids, mask, imgs, imasks, s, r, num_steps=10,
        noise=jnp.asarray(noise)))
    srv.infer = lambda ids, mask, imgs, imasks, s, r: fn(
        params, ids, mask, imgs, imasks, s, r)
    httpd = srv.serve_background()
    try:
        ours = np.asarray(_post(
            httpd.server_address[1],
            {"text": TEXT, "states": json.dumps(states)}, [png],
        ))
    finally:
        httpd.shutdown()
    assert ours.shape == acts_ref.shape == (5, 7)
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)


# ---------------------------------------------------------------------------
# DM0 (Qwen3 pair; DM0Tokenization token/ar/loss masks — VERDICT r4 #5)
# ---------------------------------------------------------------------------


class _HfEncShim:
    """HF-tokenizer call surface over SimpleTokenizer so the REFERENCE's
    DM0Tokenization (tokenization/process.py:130-245) runs unmodified:
    encode(text, add_special_tokens=...) maps to add_bos."""

    def __init__(self, tok):
        self._tok = tok
        self.pad_token_id = tok.pad_token_id
        self.model_max_length = tok.model_max_length

    def encode(self, text, add_special_tokens=True):
        return self._tok.encode(text, add_bos=add_special_tokens)

    def decode(self, ids, **kw):
        return self._tok.decode(ids)


def test_dm0_bytes_to_actions_parity(ref_env, siglip_dir):
    """The reference DM0 serving recipe (exp/dm0_exp.py:330-520) — its
    DM0Tokenization ('step' template; token/ar/loss mask construction,
    process.py:130-245), 3-view zero padding, quantile PadState+ActionNorm,
    DM0ForCausalLM.inference_action (merged qk-norm attention), quantile
    ActionDenorm+AbsoluteAction, [..., :7] slice — against our FlowVLAServer
    (DM0Exp, our DM0Tokenization) on the same PNG bytes/prompt/states."""
    import dataclasses

    from transformers import Qwen3Config

    from dexbotic.data.dataset.transform.action import ActionNorm, PadState
    from dexbotic.data.dataset.transform.common import Pipeline, ToNumpy, ToTensor
    from dexbotic.data.dataset.transform.output import AbsoluteAction, ActionDenorm
    from dexbotic.model.dm0 import dm0_arch
    from dexbotic.tokenization.process import DM0Tokenization as RefDM0Tok

    from dexbotic_tpu.data.image_processing import ImageProcessorConfig
    from dexbotic_tpu.exp.pi0_exp import DM0Exp, FlowModelConfig
    from dexbotic_tpu.exp.serve import FlowVLAServer
    from dexbotic_tpu.models.flow_vla import dm0_config, flow_vla_inference_action
    from dexbotic_tpu.utils.convert import convert_flow_vla
    from test_policy_parity import LLAMA_T as _LLAMA

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
    torch.manual_seed(61)
    ref = dm0_arch.DM0ForCausalLM(cfg_r).eval().float()

    rs = np.random.RandomState(62)
    norms = {
        "action": {"min": (-1 - rs.rand(8)).round(3).tolist(),
                   "max": (1 + rs.rand(8)).round(3).tolist()},
        "state": {"min": (-2 - rs.rand(8)).round(3).tolist(),
                  "max": (2 + rs.rand(8)).round(3).tolist()},
    }
    states = rs.randn(6).round(3).tolist()
    png = _png_bytes(63, w=28, h=28)
    noise = rs.randn(1, 5, 8).astype(np.float32)

    exp = DM0Exp(
        model=FlowModelConfig(
            variant="dm0", llm_preset="test", expert_preset="test",
            vit_preset="test", action_dim=8, chunk_size=5,
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=48,
                                           chat_template="step"),
    )
    exp.data = dataclasses.replace(
        exp.data, num_images=3, image_processor=ImageProcessorConfig(size=28),
        aug_policy=None,
    )
    exp.inference_cfg = dataclasses.replace(
        exp.inference_cfg, action_dim_out=7, non_delta_mask=[6],
    )
    assert exp.action.use_quantiles
    tokenizer = exp.tokenizer.build_tokenizer()

    # --- (a) reference torch serving path with ITS DM0Tokenization
    pil = Image.open(io.BytesIO(png)).convert("RGB")
    img = ref.process_images([pil]).to(dtype=ref.dtype)
    img = torch.cat([img, torch.zeros_like(img[0:1]).repeat(2, 1, 1, 1)], dim=0)
    image_masks = torch.tensor([True, False, False])[None]
    ref_tok = RefDM0Tok(_HfEncShim(tokenizer))
    ref_out = ref_tok([{"from": "human", "value": TEXT}])
    ref_ids = np.array([ref_out["input_ids"]])
    amask = np.array(ref_ids != tokenizer.pad_token_id)
    st = np.asarray(json.loads(json.dumps(states)), np.float64)[None]
    norms_np = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
                for k, v in norms.items()}
    in_pipe = Pipeline([PadState(ndim=8, axis=-1),
                        ActionNorm(statistic_mapping=norms_np, strict=False,
                                   use_quantiles=True),
                        ToTensor()])
    out_pipe = Pipeline([ToNumpy(),
                         ActionDenorm(statistic_mapping=norms_np, strict=False,
                                      use_quantiles=True),
                         AbsoluteAction()])
    inputs = in_pipe({
        "input_ids": ref_ids, "attention_mask": amask, "state": st,
        "images": img[None], "image_masks": image_masks,
        "meta_data": {"non_delta_mask": np.array([6])},
    })
    orig = torch.normal
    torch.normal = lambda *a, **k: torch.tensor(noise)
    try:
        with torch.no_grad():
            acts = ref.inference_action(
                input_ids=inputs["input_ids"], attention_mask=inputs["attention_mask"],
                states=inputs["state"].float(), images=inputs["images"].float(),
                image_masks=inputs["image_masks"], diffusion_steps=10,
            )
    finally:
        torch.normal = orig
    outputs = {k: v.detach().cpu().numpy() if isinstance(v, torch.Tensor) else v
               for k, v in inputs.items()}
    outputs["action"] = acts.detach().cpu().numpy()
    acts_ref = np.asarray(out_pipe(outputs)["action"])[0, ..., :7]

    # our DM0Tokenization must agree with the reference's at the ID level —
    # the masks too (token/ar/loss; the server only ships ids+mask, so pin
    # the full surface here)
    ours_tok = exp.build_tokenization(tokenizer)(
        conversations=[{"from": "human", "value": TEXT}])
    np.testing.assert_array_equal(ours_tok["input_ids"], ref_out["input_ids"])
    np.testing.assert_array_equal(ours_tok["token_mask"], ref_out["token_mask"])
    np.testing.assert_array_equal(ours_tok["ar_mask"], ref_out["ar_mask"])
    np.testing.assert_array_equal(ours_tok["loss_mask"], ref_out["loss_mask"])

    # --- (b) our HTTP server
    qwen_t = dataclasses.replace(_LLAMA, qk_norm=True)
    qwen_expert_t = dataclasses.replace(
        _LLAMA, vocab_size=8, hidden_size=32, intermediate_size=64,
        qk_norm=True, has_embed=False,
    )
    cfg = dm0_config(qwen_t, qwen_expert_t, SIGLIP_T, action_dim=8,
                     chunk_size=5, projector_type="linear")
    params = convert_flow_vla(_sd(ref), cfg)
    srv = FlowVLAServer(exp, cfg, params, tokenizer, norms,
                        host="127.0.0.1", port=0)
    fn = jax.jit(lambda p, ids, mask, imgs, imasks, s, r: flow_vla_inference_action(
        p, cfg, ids, mask, imgs, imasks, s, r, num_steps=10,
        noise=jnp.asarray(noise)))
    srv.infer = lambda ids, mask, imgs, imasks, s, r: fn(
        params, ids, mask, imgs, imasks, s, r)
    httpd = srv.serve_background()
    try:
        ours = np.asarray(_post(
            httpd.server_address[1],
            {"text": TEXT, "states": json.dumps(states)}, [png],
        ))
    finally:
        httpd.shutdown()
    assert ours.shape == acts_ref.shape == (5, 7)
    np.testing.assert_allclose(ours, acts_ref, atol=ATOL)
