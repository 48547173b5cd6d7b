"""Replay a released Dexbotic checkpoint end-to-end on TPU — one command.

The single most load-bearing validation still blocked on weight access
(VERDICT r2 "What's missing" #1): take a real DB checkpoint dir (the
reference loads its whole zoo via from_pretrained,
/root/reference/dexbotic/model/dexbotic_arch.py:72-79, docs/ModelZoo.md),
convert it with utils/convert.py, and run the reference's own tutorial
replay — test_data/libero_test.png + the moka-pots prompt
(/root/reference/docs/Tutorial.md:117, playground/benchmarks/libero/
libero_cogact.py:70-83) — through our jitted inference path.

Usage:
    python script/replay_checkpoint.py --checkpoint /path/to/DB-CogACT-7B
    python script/replay_checkpoint.py --checkpoint ... --policy pi0 \
        --image my.png --prompt 'pick up the cube' --compare-torch

With --compare-torch (needs the torch reference importable and enough host
RAM) the same checkpoint also runs through the reference's torch code
in-process — the same technique as tests/test_policy_parity.py — and the
max|Δ| between chunks is printed.  ≤1e-3 = conversion validated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_IMAGE = "/root/reference/test_data/libero_test.png"
DEFAULT_PROMPT = "What action should the robot take to put both moka pots on the stove?"


def _load_image(path: str) -> np.ndarray:
    try:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    except ImportError:
        import cv2

        return cv2.imread(path)[:, :, ::-1].copy()


def _read_hf_config(ckpt: str) -> dict:
    p = os.path.join(ckpt, "config.json")
    return json.load(open(p)) if os.path.exists(p) else {}


def build_exp(policy: str, ckpt: str):
    """Exp object sized from the checkpoint's config.json when present,
    else the DB release defaults for that policy class."""
    hf = _read_hf_config(ckpt)

    if policy == "cogact":
        from playground.benchmarks.libero.libero_cogact import LiberoCogActExp

        exp = LiberoCogActExp()
    elif policy == "pi0":
        from dexbotic_tpu.exp.pi0_exp import Pi0Exp

        exp = Pi0Exp()
    elif policy == "oft":
        from dexbotic_tpu.exp.oft_exp import OFTExp

        exp = OFTExp()
    else:
        raise SystemExit(f"unknown --policy {policy!r}")

    if hf:
        # honor the checkpoint's own dims when they disagree with defaults
        import dataclasses

        m = exp.model
        for ours, theirs in (
            ("action_dim", "action_dim"),
            ("chunk_size", "chunk_size"),
            ("action_model_type", "action_model_type"),
        ):
            if theirs in hf and hasattr(m, ours):
                m = dataclasses.replace(m, **{ours: hf[theirs]})
        exp.model = m
    return exp


def convert_params(policy: str, ckpt: str, cfg):
    from dexbotic_tpu.utils.convert import (
        convert_cogact,
        convert_flow_vla,
        convert_oft,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(ckpt)
    fn = {"cogact": convert_cogact, "pi0": convert_flow_vla, "oft": convert_oft}[policy]
    return fn(sd, cfg), sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="DB checkpoint dir")
    ap.add_argument("--policy", default="cogact", choices=["cogact", "pi0", "oft"])
    ap.add_argument("--image", default=DEFAULT_IMAGE)
    ap.add_argument("--prompt", default=DEFAULT_PROMPT)
    ap.add_argument("--compare-torch", action="store_true",
                    help="also run the reference torch model and diff chunks")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    exp = build_exp(args.policy, args.checkpoint)
    cfg = exp.model.build_config()
    params, sd = convert_params(args.policy, args.checkpoint, cfg)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16 if np.asarray(x).ndim >= 2 else None),
        params,
    )
    tokenizer = exp.tokenizer.build_tokenizer()
    image = _load_image(args.image)

    norms = None
    np_path = os.path.join(args.checkpoint, "norm_stats.json")
    if os.path.exists(np_path):
        norms = json.load(open(np_path))["norm_stats"]["default"]

    if args.policy == "cogact":
        from dexbotic_tpu.exp.serve import prepare_cogact_inputs
        from dexbotic_tpu.models.cogact import cogact_inference_action, denorm_actions

        ids, valid, imgs = prepare_cogact_inputs(exp, cfg, tokenizer, [image], args.prompt)
        noise = jnp.asarray(
            np.random.RandomState(0).standard_normal(
                (1, cfg.chunk_size, cfg.action_dim)
            ),
            jnp.float32,
        )
        out = jax.jit(
            lambda p, i, v, im: cogact_inference_action(
                p, cfg, i, v, im, jax.random.PRNGKey(0), noise=noise
            )
        )(params, ids, valid, imgs)
        chunk = np.asarray(jax.device_get(out))[0]
    else:
        raise SystemExit(
            f"--policy {args.policy} replay wiring TODO; cogact is the "
            "tutorial-validated path"
        )

    print("normalized chunk:")
    print(np.array2string(chunk, precision=5))
    if norms is not None:
        den = np.asarray(jax.device_get(
            denorm_actions(jnp.asarray(chunk), norms["min"], norms["max"])
        ))
        print("denormalized actions:")
        print(np.array2string(den, precision=5))

    if args.compare_torch:
        # Run the SAME checkpoint through the reference's own torch code
        # (the technique of tests/test_policy_parity.py, at full scale) —
        # the exact call chain of the tutorial replay:
        # /root/reference/dexbotic/exp/cogact_exp.py:145-177
        # (_get_response -> model.inference_action).
        import torch

        sys.path.insert(0, "/root/reference")
        from dexbotic.constants import (  # type: ignore
            DEFAULT_IMAGE_TOKEN, IMAGE_TOKEN_INDEX,
        )
        from dexbotic.model.cogact.cogact_arch import CogACTForCausalLM  # type: ignore
        from dexbotic.tokenization import conversation as conversation_lib  # type: ignore
        from dexbotic.tokenization.tokenize import tokenizer_image_token  # type: ignore
        from PIL import Image
        from transformers import AutoTokenizer

        model = CogACTForCausalLM.from_pretrained(
            args.checkpoint, torch_dtype=torch.float32,
            low_cpu_mem_usage=True, trust_remote_code=True,
        )
        model.eval()
        ref_tok = AutoTokenizer.from_pretrained(args.checkpoint)
        pil = Image.open(args.image).convert("RGB")
        image_tensor = model.process_images([pil]).to(dtype=model.dtype)
        conv = conversation_lib.conv_templates[model.config.chat_template].copy()
        conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + args.prompt)
        conv.append_message(conv.roles[1], " ")
        ref_ids = tokenizer_image_token(
            conv.get_prompt(), ref_tok, IMAGE_TOKEN_INDEX, return_tensors="pt"
        ).unsqueeze(0)
        # pin the torch sampler's initial draw to OUR injected noise so the
        # eta=0 DDIM chains are deterministic on both sides (the
        # test_policy_parity.py technique)
        orig_randn = torch.randn
        torch.randn = lambda *s, **k: torch.tensor(  # noqa: E731
            np.asarray(noise), dtype=k.get("dtype", torch.float32)
        )
        try:
            with torch.inference_mode():
                ref_out = model.inference_action(
                    ref_ids, image_tensor,
                    {"cfg_scale": 1.5, "num_ddim_steps": 10,
                     "action_norms": norms or {"min": -1, "max": 1}},
                )
        finally:
            torch.randn = orig_randn
        ref_chunk = np.asarray(ref_out, np.float64).reshape(chunk.shape[0], -1)
        ours = den if norms is not None else chunk
        d = np.max(np.abs(ref_chunk[:, : ours.shape[1]] - ours))
        status = "OK <=1e-3" if d <= 1e-3 else "MISMATCH — conversion suspect"
        print(f"reference torch replay max|delta| = {d:.2e} ({status})")


if __name__ == "__main__":
    main()
