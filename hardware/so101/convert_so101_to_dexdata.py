"""SO-101 LeRobot recordings -> Dexdata converter.

Behavioral equivalent of /root/reference/hardware/so101/
convert_so101_to_dexdata.py: walks <lerobot_dir>/<task>/<split>/ trees,
extracts task prompts from meta/tasks.parquet (trying the standard columns,
then any string column, then a string index) or meta/tasks.jsonl, falls back
to the task directory name when no prompt exists, discovers camera folders
under videos/, converts every chunk's episode parquets to one jsonl each
(state from observation.state or the dual-arm left_arm+zeros layout; action;
prompt with '@'-split subtask in extra), renames + copies the per-camera
mp4s next to the jsonl with stable episode numbering, and recovers
per-episode on errors.

Usage:
    python hardware/so101/convert_so101_to_dexdata.py \
        -i /path/to/so101_recordings -o ./data/so101

Requires pyarrow (gated import; not baked into this image).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

import numpy as np

SPLITS = ("train", "test", "val")


def get_task_list(meta_dir: str) -> list[str]:
    """tasks.parquet (several possible layouts) or tasks.jsonl -> prompts."""
    parquet_path = os.path.join(meta_dir, "tasks.parquet")
    if os.path.exists(parquet_path):
        import pandas as pd

        df = pd.read_parquet(parquet_path)
        for col in ("task", "instruction", "language_instruction", "desc",
                    "description"):
            if col in df.columns:
                return df[col].astype(str).tolist()
        for col in df.columns:
            if df[col].dtype == object:
                return df[col].astype(str).tolist()
        # some recordings store the prompt strings in the index
        idx = df.index.astype(str).tolist()
        if idx and not all(t.replace(".", "").replace("-", "").isdigit() for t in idx):
            return idx
        return df.iloc[:, 0].astype(str).tolist() if len(df.columns) else []

    jsonl_path = os.path.join(meta_dir, "tasks.jsonl")
    tasks = []
    if os.path.exists(jsonl_path):
        with open(jsonl_path) as f:
            for line in f:
                try:
                    info = json.loads(line)
                except json.JSONDecodeError:
                    continue
                tasks.append(info.get("task", info.get("instruction", "")))
    return tasks


def next_episode_idx(output_dir: str) -> int:
    if not os.path.exists(output_dir):
        return 0
    return len(glob.glob(os.path.join(output_dir, "*.jsonl")))


def parse_episode(df, task_list: list[str], camera_map: dict[str, str]) -> list[dict]:
    """One episode dataframe -> Dexdata dicts; None-like empty list on
    unparseable rows (episode skipped, reference contract)."""
    cols = df.columns
    out = []
    for row_id, row in df.iterrows():
        try:
            if "observation.state" in cols:
                state = np.asarray(row["observation.state"], np.float64)
            elif "observation.state.left_arm" in cols:
                # dual-arm layout: left arm + zero pad (reference :86-88)
                state = np.concatenate(
                    [np.asarray(row["observation.state.left_arm"], np.float64),
                     np.zeros(10)]
                )
            else:
                state = np.zeros(16)
            action = (np.asarray(row["action"], np.float64)
                      if "action" in cols else np.zeros(6))

            task_index = int(row.get("task_index", 0))
            prompt = (str(task_list[task_index])
                      if task_list and task_index < len(task_list)
                      else "unknown task")
            subtask = prompt.split("@")[1] if "@" in prompt else prompt

            entry = {
                "prompt": prompt,
                "state": state.tolist(),
                "action": action.tolist(),
                "is_robot": True,
                "extra": {
                    "subtask": subtask,
                    "timestamp": float(row.get("timestamp", 0.0)),
                    "episode_index": int(row.get("episode_index", 0)),
                },
            }
            frame_index = int(row.get("frame_index", 0))
            for i, (cam, url) in enumerate(sorted(camera_map.items()), start=1):
                entry[f"images_{i}"] = {
                    "type": "video", "url": url, "frame_idx": frame_index,
                    "_camera_name": cam,
                }
            out.append(entry)
        except Exception as e:  # noqa: BLE001 — poison the episode
            print(f"error parsing row {row_id}: {e}")
            return []
    return out


def convert(lerobot_dir: str, output_dir: str) -> int:
    try:
        import pyarrow.parquet as pq
    except ImportError as e:
        raise SystemExit(f"pyarrow required for SO-101 conversion: {e}")

    converted = 0
    tasks = [d for d in sorted(os.listdir(lerobot_dir))
             if os.path.isdir(os.path.join(lerobot_dir, d))]
    for task_name in tasks:
        for split in SPLITS:
            split_dir = os.path.join(lerobot_dir, task_name, split)
            if not os.path.isdir(split_dir):
                continue
            meta_dir = os.path.join(split_dir, "meta")
            if not os.path.exists(meta_dir):
                meta_dir = os.path.join(lerobot_dir, task_name, "meta")
            task_list = get_task_list(meta_dir)
            if not task_list or task_list[0].isdigit():
                fixed = task_name.replace("_", " ")
                task_list = [fixed] * 1000
                print(f"no prompt in dataset; falling back to '{fixed}'")

            data_root = os.path.join(split_dir, "data")
            video_base = os.path.join(split_dir, "videos")
            if not os.path.exists(data_root):
                continue
            camera_folders = []
            if os.path.exists(video_base):
                dirs = [d for d in os.listdir(video_base)
                        if os.path.isdir(os.path.join(video_base, d))]
                camera_folders = sorted(d for d in dirs if "images" in d) or sorted(dirs)

            out_jsonl = os.path.join(output_dir, "jsonl", task_name)
            out_video = os.path.join(output_dir, "videos", task_name)
            os.makedirs(out_jsonl, exist_ok=True)
            os.makedirs(out_video, exist_ok=True)

            for chunk in sorted(os.listdir(data_root)):
                chunk_dir = os.path.join(data_root, chunk)
                if not os.path.isdir(chunk_dir):
                    continue
                for fname in sorted(os.listdir(chunk_dir)):
                    if not fname.endswith(".parquet"):
                        continue
                    try:
                        df = pq.read_table(os.path.join(chunk_dir, fname)).to_pandas()
                    except Exception as e:  # noqa: BLE001
                        print(f"bad parquet {fname}: {e}")
                        continue
                    eid = next_episode_idx(out_jsonl)
                    cam_map = {
                        cam.split(".")[-1]: os.path.join(
                            task_name, f"episode_{eid:05d}_{cam.split('.')[-1]}.mp4")
                        for cam in camera_folders
                    }
                    rows = parse_episode(df, task_list, cam_map)
                    if not rows:
                        continue
                    with open(os.path.join(out_jsonl, f"episode_{eid:05d}.jsonl"),
                              "w") as f:
                        f.write("\n".join(json.dumps(r, ensure_ascii=False)
                                          for r in rows) + "\n")
                    src_vid = fname.replace(".parquet", ".mp4")
                    for cam in camera_folders:
                        src = os.path.join(video_base, cam, chunk, src_vid)
                        dst = os.path.join(
                            out_video,
                            os.path.basename(cam_map[cam.split(".")[-1]]))
                        if os.path.exists(src):
                            shutil.copy2(src, dst)
                    converted += 1
    print(f"converted {converted} episodes -> {output_dir}")
    return converted


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--lerobot_dir", required=True)
    ap.add_argument("-o", "--output_dir", required=True)
    args = ap.parse_args()
    convert(args.lerobot_dir, args.output_dir)
