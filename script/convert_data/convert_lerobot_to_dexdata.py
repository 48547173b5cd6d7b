"""LeRobot v2 dataset -> Dexdata converter.

Behavioral equivalent of the reference converter (/root/reference/script/
convert_data/convert_lerobot_to_dexdata.py): per-episode parquet + per-camera
mp4 -> one jsonl per episode with {"type": "video", "frame_idx"} image refs,
prompt from the meta/tasks.jsonl task table (validated against its
task_index column), optional coarse-task/sub-task split (the reference's
"Chinese@English" subtask schema, :138-145), row metadata carried in an
"extra" dict (:160-169), and per-episode error recovery (skip, don't abort,
:103-106).

The reference hardcodes one dual-arm robot's 60-dim state layout; here the
state/action column lists are CLI-configurable so any LeRobot v2 dataset
converts (pass the concatenation order explicitly).

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


def load_task_list(lerobot_dir: str) -> list:
    """meta/tasks.jsonl -> list of task strings, validated so that line i
    carries task_index i (the reference asserts this contract)."""
    task_file = os.path.join(lerobot_dir, "meta", "tasks.jsonl")
    tasks = []
    if not os.path.isfile(task_file):
        return tasks
    with open(task_file) as f:
        for i, line in enumerate(f):
            info = json.loads(line)
            assert info.get("task_index", i) == i, (
                f"task index mismatch at line {i}: {info}"
            )
            tasks.append(info["task"])
    return tasks


def parse_episode(
    df,
    state_cols,
    action_cols,
    video_keys,
    video_rel_paths,
    task_list,
    subtask_schema: bool = False,
):
    """One episode dataframe -> list of Dexdata dicts, or None on a parse
    error (the caller skips the episode, reference contract)."""
    import numpy as np

    lines = []
    for row_id, row in df.iterrows():
        try:
            state = np.concatenate(
                [np.atleast_1d(np.asarray(row[c], dtype=np.float64)) for c in state_cols]
            )
            frame_idx = int(row["frame_index"])
            entry = {"state": state.tolist(), "is_robot": True}
            if action_cols:
                action = np.concatenate(
                    [np.atleast_1d(np.asarray(row[c], dtype=np.float64))
                     for c in action_cols]
                )
                entry["action"] = action.tolist()

            # prompt: coarse task when the dataset distinguishes coarse/sub
            task_idx = int(row.get("task_index", 0))
            coarse_idx = int(row.get("coarse_task_index", task_idx))
            prompt = task_list[coarse_idx] if coarse_idx < len(task_list) else ""
            entry["prompt"] = prompt

            extra = {}
            if subtask_schema:
                # sub-task strings are "<native>@<english>"; invalid rows
                # poison the episode (reference :138-145)
                sub = task_list[task_idx] if task_idx < len(task_list) else None
                if sub is None or len(sub.split("@")) != 2:
                    print(f"invalid subtask format at row {row_id}: {sub!r}")
                    return None
                extra["subtask"] = sub.split("@")[1]
            for meta_col in ("timestamp", "episode_index", "index",
                             "coarse_quality_index", "quality_index"):
                if meta_col in row:
                    v = row[meta_col]
                    extra[meta_col] = v.item() if hasattr(v, "item") else v
            if extra:
                entry["extra"] = extra

            for i, rel in enumerate(video_rel_paths, start=1):
                entry[f"images_{i}"] = {
                    "type": "video", "url": rel, "frame_idx": frame_idx,
                }
            lines.append(json.dumps(entry))
        except Exception as e:  # noqa: BLE001 — skip the whole episode
            print(f"error parsing row {row_id} ({e}); skipping episode")
            return None
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lerobot_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--state_cols", nargs="+", default=["observation.state"],
                    help="parquet columns concatenated (in order) into 'state'")
    ap.add_argument("--action_cols", nargs="+", default=[])
    ap.add_argument("--video_keys", nargs="+", default=["observation.images.top"])
    ap.add_argument("--subtask_schema", action="store_true",
                    help="task strings are '<native>@<english>'; emit extra.subtask")
    args = ap.parse_args()

    try:
        import pyarrow.parquet as pq
    except ImportError as e:
        raise SystemExit(f"pyarrow required for LeRobot conversion: {e}")

    os.makedirs(args.output_dir, exist_ok=True)
    task_list = load_task_list(args.lerobot_dir)

    data_root = os.path.join(args.lerobot_dir, "data")
    video_root = os.path.join(args.lerobot_dir, "videos")
    count = skipped = 0
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
            for rel in rels:
                if not os.path.isfile(os.path.join(args.lerobot_dir, rel)) and not os.path.isfile(rel):
                    print(f"warning: video missing for {ep}: {rel}")
            lines = parse_episode(
                df, args.state_cols, args.action_cols, args.video_keys, rels,
                task_list, subtask_schema=args.subtask_schema,
            )
            if lines is None:
                skipped += 1
                continue
            out = os.path.join(args.output_dir, f"{ep}.jsonl")
            with open(out, "w") as f:
                f.write("\n".join(lines) + "\n")
            count += 1
    print(f"converted {count} episodes ({skipped} skipped) -> {args.output_dir}")


if __name__ == "__main__":
    main()
