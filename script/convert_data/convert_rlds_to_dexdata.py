"""RLDS (TFDS robot datasets, e.g. Open X-Embodiment) -> Dexdata converter.

Equivalent surface to /root/reference/script/convert_data/
convert_rlds_to_dexdata.py: iterates RLDS episodes, writes one jsonl per
episode + per-frame PNG images.

Usage:
    python script/convert_data/convert_rlds_to_dexdata.py \
        --rlds_name bridge --data_dir /tf_datasets --output_dir ./data/bridge

Requires tensorflow_datasets (gated import; not baked into this image).
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rlds_name", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--image_key", default="image")
    ap.add_argument("--state_key", default="state")
    ap.add_argument("--action_key", default="action")
    ap.add_argument("--instruction_key", default="natural_language_instruction")
    ap.add_argument("--max_episodes", type=int, default=None)
    args = ap.parse_args()

    try:
        import numpy as np
        import tensorflow_datasets as tfds
        from PIL import Image
    except ImportError as e:
        raise SystemExit(f"tensorflow_datasets required for RLDS conversion: {e}")

    os.makedirs(args.output_dir, exist_ok=True)
    img_dir = os.path.join(args.output_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    ds = tfds.load(args.rlds_name, data_dir=args.data_dir, split=args.split)
    for ei, episode in enumerate(ds):
        if args.max_episodes and ei >= args.max_episodes:
            break
        lines = []
        for ti, step in enumerate(episode["steps"]):
            obs = step["observation"]
            img = np.asarray(obs[args.image_key])
            rel = f"images/ep{ei:06d}_f{ti:05d}.png"
            Image.fromarray(img).save(os.path.join(args.output_dir, rel))
            instr = obs.get(args.instruction_key, step.get(args.instruction_key, b""))
            if hasattr(instr, "numpy"):
                instr = instr.numpy()
            if isinstance(instr, bytes):
                instr = instr.decode()
            entry = {
                "images_1": {"type": "image", "url": rel},
                "state": np.asarray(obs.get(args.state_key, step[args.action_key])).ravel().tolist(),
                "action": np.asarray(step[args.action_key]).ravel().tolist(),
                "prompt": instr,
                "is_robot": True,
            }
            lines.append(json.dumps(entry))
        with open(os.path.join(args.output_dir, f"ep{ei:06d}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"converted -> {args.output_dir}")


if __name__ == "__main__":
    main()
