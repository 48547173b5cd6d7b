"""LeRobot v2 dataset -> Dexdata converter.

Generic equivalent of the reference converter (/root/reference/script/
convert_data/convert_lerobot_to_dexdata.py): per-episode parquet + mp4
-> one jsonl per episode referencing video frames, with configurable
state/action column mapping.

Usage:
    python script/convert_data/convert_lerobot_to_dexdata.py \
        --lerobot_dir /path/to/lerobot_dataset --output_dir ./data/myrobot \
        --state_cols observation.state --action_cols action \
        --video_keys observation.images.top

Requires pyarrow (gated import; not baked into this image).
"""

from __future__ import annotations

import argparse
import json
import os


def parse_episode(df, state_cols, action_cols, video_keys, video_rel_paths, task_list):
    import numpy as np

    lines = []
    for _, row in df.iterrows():
        state = np.concatenate(
            [np.atleast_1d(np.asarray(row[c], dtype=np.float64)) for c in state_cols]
        )
        entry = {
            "state": state.tolist(),
            "is_robot": True,
        }
        if action_cols:
            action = np.concatenate(
                [np.atleast_1d(np.asarray(row[c], dtype=np.float64)) for c in action_cols]
            )
            entry["action"] = action.tolist()
        task_idx = int(row.get("task_index", 0))
        entry["prompt"] = task_list[task_idx] if task_idx < len(task_list) else ""
        frame_idx = int(row["frame_index"])
        for i, (key, rel) in enumerate(zip(video_keys, video_rel_paths), start=1):
            entry[f"images_{i}"] = {"type": "video", "url": rel, "frame_idx": frame_idx}
        lines.append(json.dumps(entry))
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lerobot_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--state_cols", nargs="+", default=["observation.state"])
    ap.add_argument("--action_cols", nargs="+", default=[])
    ap.add_argument("--video_keys", nargs="+", default=["observation.images.top"])
    args = ap.parse_args()

    try:
        import pyarrow.parquet as pq
    except ImportError as e:
        raise SystemExit(f"pyarrow required for LeRobot conversion: {e}")

    os.makedirs(args.output_dir, exist_ok=True)

    # task strings (LeRobot v2: meta/tasks.jsonl)
    task_list = []
    tasks_file = os.path.join(args.lerobot_dir, "meta", "tasks.jsonl")
    if os.path.exists(tasks_file):
        with open(tasks_file) as f:
            for line in f:
                task_list.append(json.loads(line)["task"])

    data_root = os.path.join(args.lerobot_dir, "data")
    video_root = os.path.join(args.lerobot_dir, "videos")
    count = 0
    for chunk in sorted(os.listdir(data_root)):
        chunk_dir = os.path.join(data_root, chunk)
        for fname in sorted(os.listdir(chunk_dir)):
            if not fname.endswith(".parquet"):
                continue
            ep = fname[: -len(".parquet")]
            df = pq.read_table(os.path.join(chunk_dir, fname)).to_pandas()
            rels = [
                os.path.join(video_root, chunk, key, f"{ep}.mp4")
                for key in args.video_keys
            ]
            lines = parse_episode(
                df, args.state_cols, args.action_cols, args.video_keys, rels, task_list
            )
            out = os.path.join(args.output_dir, f"{ep}.jsonl")
            with open(out, "w") as f:
                f.write("\n".join(lines) + "\n")
            count += 1
    print(f"converted {count} episodes -> {args.output_dir}")


if __name__ == "__main__":
    main()
