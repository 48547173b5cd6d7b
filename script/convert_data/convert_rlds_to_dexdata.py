"""RLDS (TFDS robot datasets, e.g. Open X-Embodiment / LIBERO) -> Dexdata.

Behavioral equivalent of /root/reference/script/convert_data/
convert_rlds_to_dexdata.py (498 LoC surface): per-dataset multi-camera key
maps (image + depth streams, None-gated), one mp4 video per camera stream
per episode (frames referenced as {"type": "video", "url", "frame_idx"}),
string-encoded image decode, state synthesized by accumulating the action's
position/orientation deltas (state = pos + ori + [gripper]), per-episode
error recovery, and the videos/<ds>/episodeN_<key>.mp4 +
jsons/<ds>/episodeN.jsonl output layout.

Differences by design: video IO uses cv2 (what the rest of this repo's data
layer reads with, data/multimodal.py) instead of imageio/ffmpeg, `--frames
png` keeps a dependency-free fallback, and unknown datasets can be converted
by passing explicit --image_keys/--depth_keys instead of editing the config
table.

Usage:
    python script/convert_data/convert_rlds_to_dexdata.py \
        --rlds_name libero_10_no_noops --data_dir /tf_datasets \
        --output_dir ./data/libero10

Requires tensorflow_datasets (gated import; not baked into this image).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Per-dataset observation-key maps (canonical view name -> RLDS obs key;
# None = that view is absent).  Mirrors the reference's DATASET_CONFIG table.
DATASET_CONFIGS: dict[str, dict] = {
    name: {
        "image_obs_keys": {"primary": "image", "secondary": None, "wrist": "wrist_image"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
    }
    for name in (
        "libero_10_no_noops", "libero_10", "libero_spatial",
        "libero_object", "libero_goal",
    )
}


def decode_frame(value) -> np.ndarray | None:
    """RLDS image value -> uint8 HWC array.  Handles string-encoded images
    (tf.string PNG/JPEG bytes), tf tensors, and plain arrays."""
    if value is None:
        return None
    try:
        import tensorflow as tf

        if isinstance(value, tf.Tensor):
            if value.dtype == tf.string:
                if int(tf.strings.length(value)) == 0:
                    return None
                value = tf.io.decode_image(value, expand_animations=False, dtype=tf.uint8)
            return value.numpy()
    except ImportError:
        pass
    arr = np.asarray(value)
    if arr.dtype == object or arr.dtype.kind == "S":
        import cv2

        buf = np.frombuffer(bytes(arr.item()), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        return img[..., ::-1] if img is not None else None
    return arr


class StreamWriter:
    """One camera stream of an episode: mp4 (cv2) or per-frame PNGs."""

    def __init__(self, out_dir: str, rel_base: str, mode: str, fps: int):
        self.mode = mode
        self.fps = fps
        self.out_dir = out_dir
        self.rel_base = rel_base  # e.g. "<ds>/episode3_image_primary"
        self.rel_url = rel_base + (".mp4" if mode == "video" else "")
        self._writer = None
        self._count = 0
        os.makedirs(os.path.dirname(os.path.join(out_dir, rel_base)), exist_ok=True)

    def append(self, frame: np.ndarray) -> int:
        """Write one frame; returns its frame index."""
        idx = self._count
        self._count += 1
        if frame.ndim == 2:  # depth/gray -> 3-channel for the video container
            frame = np.repeat(frame[..., None], 3, axis=-1)
        if self.mode == "video":
            import cv2

            if self._writer is None:
                h, w = frame.shape[:2]
                self._writer = cv2.VideoWriter(
                    os.path.join(self.out_dir, self.rel_url),
                    cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h),
                )
            self._writer.write(np.ascontiguousarray(frame[..., ::-1]))  # RGB->BGR
        else:
            from PIL import Image

            Image.fromarray(frame.astype(np.uint8)).save(
                os.path.join(self.out_dir, f"{self.rel_base}_f{idx:05d}.png")
            )
        return idx

    def frame_entry(self, idx: int) -> dict:
        if self.mode == "video":
            return {"type": "video", "url": self.rel_url, "frame_idx": idx}
        return {"type": "image", "url": f"{self.rel_base}_f{idx:05d}.png"}

    def close(self):
        if self._writer is not None:
            self._writer.release()


def _to_numpy(x) -> np.ndarray:
    return x.numpy() if hasattr(x, "numpy") else np.asarray(x)


def _instruction(episode, step0) -> str:
    """Episode-level language_instruction, else step-level, else ''."""
    for container in (episode.get("task", {}), episode, step0):
        for key in ("language_instruction", "natural_language_instruction"):
            if key in container:
                v = container[key]
                v = _to_numpy(v)
                if v.ndim > 0:
                    v = v.reshape(-1)[0]
                v = v.item() if hasattr(v, "item") else v
                return v.decode() if isinstance(v, bytes) else str(v)
    return ""


def convert_episode(
    steps: list[dict],
    episode_index: int,
    dataset_name: str,
    instruction: str,
    image_keys: dict[str, str],
    depth_keys: dict[str, str],
    video_dir: str,
    frames: str,
    fps: int,
) -> list[dict]:
    """One episode -> list of Dexdata jsonl entries (+ stream files on disk).

    State is synthesized by accumulating the action's xyz/rpy deltas with the
    current gripper command appended — the reference's process_step contract
    for datasets that ship no proprio (convert_rlds_to_dexdata.py:112-214).
    """
    writers: dict[str, StreamWriter] = {}
    for view, key in list(image_keys.items()) + [
        (f"depth_{v}", k) for v, k in depth_keys.items()
    ]:
        if key is None:
            continue
        writers[f"{view}:{key}"] = StreamWriter(
            video_dir,
            os.path.join(dataset_name, f"episode{episode_index}_{view}"),
            frames, fps,
        )

    pos = np.zeros(3, np.float64)
    ori = np.zeros(3, np.float64)
    lines = []
    for step in steps:
        obs = step["observation"]
        action = _to_numpy(step["action"]).astype(np.float64).ravel()
        images = {}
        # images_{n} slots are keyed by the view's FIXED position in the
        # writer dict, not by per-step decode-success order: a camera that
        # intermittently returns None must not shift the view-to-index
        # mapping mid-episode (images_1 has to mean the same camera on every
        # row of the jsonl).
        for slot, (wkey, writer) in enumerate(writers.items(), start=1):
            _, obs_key = wkey.split(":", 1)
            frame = decode_frame(obs.get(obs_key))
            if frame is None:
                continue
            idx = writer.append(frame)
            images[f"images_{slot}"] = writer.frame_entry(idx)
        gripper = float(action[-1]) if action.size else 0.0
        lines.append({
            **images,
            "prompt": instruction,
            "is_robot": True,
            "state": pos.tolist() + ori.tolist() + [gripper],
        })
        if action.size >= 6:  # accumulate delta pose AFTER emitting the state
            pos += action[0:3]
            ori += action[3:6]
    for writer in writers.values():
        writer.close()
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rlds_name", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--image_keys", nargs="*", default=None,
                    help="view=obs_key overrides, e.g. primary=image wrist=wrist_image")
    ap.add_argument("--depth_keys", nargs="*", default=None)
    ap.add_argument("--frames", choices=["video", "png"], default="video")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--max_episodes", type=int, default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    try:
        import tensorflow_datasets as tfds
    except ImportError as e:
        raise SystemExit(f"tensorflow_datasets required for RLDS conversion: {e}")

    def parse_keys(pairs):
        return {p.split("=", 1)[0]: p.split("=", 1)[1] for p in pairs} if pairs else None

    cfg = DATASET_CONFIGS.get(args.rlds_name, {})
    image_keys = parse_keys(args.image_keys) or cfg.get("image_obs_keys") or {"primary": "image"}
    depth_keys = parse_keys(args.depth_keys) or cfg.get("depth_obs_keys") or {}

    video_dir = os.path.join(args.output_dir, "videos")
    json_dir = os.path.join(args.output_dir, "jsons", args.rlds_name)
    os.makedirs(video_dir, exist_ok=True)
    os.makedirs(json_dir, exist_ok=True)

    ds = tfds.load(args.rlds_name, data_dir=args.data_dir, split=args.split)
    done = 0
    for ei, episode in enumerate(ds):
        if args.max_episodes and ei >= args.max_episodes:
            break
        try:
            steps = list(episode["steps"]) if "steps" in episode else [episode]
            if not steps:
                continue
            instruction = _instruction(episode, steps[0])
            lines = convert_episode(
                steps, ei, args.rlds_name, instruction, image_keys, depth_keys,
                video_dir, args.frames, args.fps,
            )
            with open(os.path.join(json_dir, f"episode{ei}.jsonl"), "w") as f:
                f.write("\n".join(json.dumps(x) for x in lines) + "\n")
            done += 1
            if args.verbose or done % 10 == 0:
                print(f"episode {ei}: {len(lines)} frames")
        except Exception as e:  # noqa: BLE001 — per-episode recovery
            print(f"episode {ei} failed, skipping: {e}")
            continue
    print(f"converted {done} episodes -> {args.output_dir}")


if __name__ == "__main__":
    main()
