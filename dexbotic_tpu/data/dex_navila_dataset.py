"""NaVILA dataset: video-frame conversations with uniform frame history.

Equivalent of the reference's DexNavilaDataset (/root/reference/dexbotic/
data/dataset/dex_navila_dataset.py): each sample is the current frame plus a
uniformly-sampled history of earlier frames from the same episode video, fed
as a multi-image conversation ("<image>" per frame).
"""

from __future__ import annotations

import random

import numpy as np

from dexbotic_tpu.data.dexdata import DexDataset, load_jsonl
from dexbotic_tpu.data.multimodal import load_image, load_video_frames


class DexNavilaDataset(DexDataset):
    def __init__(self, *args, num_video_frames: int = 8, **kw):
        kw.setdefault("num_images", num_video_frames)
        super().__init__(*args, **kw)
        self.num_video_frames = num_video_frames
        self._length_hints = None

    def length_hints(self) -> list[int]:
        """Cheap per-sample length proxy (prompt + answer chars) for the
        length-grouped packing sampler (reference LongVILADistributedSampler,
        exp/navila_trainer.py:64-208).  Image-token count is constant per
        sample, so text length orders total sequence length."""
        if self._length_hints is None:
            per_file: dict[int, list[int]] = {}
            hints = []
            for _, file_idx, frame_idx in self.global_index:
                if file_idx not in per_file:
                    episode = load_jsonl(self.file_name_map[file_idx], parse=True)
                    per_file[file_idx] = [
                        len(str(fr.get("prompt", ""))) + len(str(fr.get("answer", "")))
                        for fr in episode
                    ]
                lens = per_file[file_idx]
                hints.append(lens[min(frame_idx, len(lens) - 1)] if lens else 0)
            self._length_hints = hints
        return self._length_hints

    def _history_indices(self, t: int) -> list[int]:
        """Uniform temporal sampling of [0, t] into num_video_frames slots
        (padding with the current frame when the episode is short)."""
        n = self.num_video_frames
        if t + 1 <= n:
            idx = list(range(t + 1)) + [t] * (n - t - 1)
        else:
            idx = np.linspace(0, t, n).round().astype(int).tolist()
        return idx

    def unsafe_getitem(self, idx) -> dict:
        ds_idx, file_idx, frame_idx = self.global_index[idx]
        jsonl_file = self.file_name_map[file_idx]
        info = self.dataset_map[ds_idx]
        episode = load_jsonl(jsonl_file, parse=True)
        if frame_idx >= len(episode):
            frame_idx = random.randint(0, len(episode) - 1)

        hist = self._history_indices(frame_idx)
        cur = episode[frame_idx]
        prefix = info["data_path_prefix"]

        # resolve history frames from the episode's image/video refs
        import os

        frames = []
        video_cache: dict = {}
        for t in hist:
            ref = episode[t].get("images_1") or episode[t].get("image")
            url = os.path.join(prefix, ref["url"])
            if ref["type"] == "video":
                fi = int(ref["frame_idx"])
                if url not in video_cache:
                    wanted = sorted(
                        {int(episode[h]["images_1"]["frame_idx"]) for h in hist
                         if (episode[h].get("images_1") or {}).get("type") == "video"}
                    )
                    video_cache[url] = load_video_frames(url, wanted)
                frames.append(video_cache[url][fi])
            else:
                frames.append(load_image(url))

        pixels = [self.image_process_func[0](f) for f in frames]
        out = {"image": np.stack(pixels, axis=0)}

        # conversation: n_frames <image> tags + the nav instruction/answer
        prompt = cur.get("prompt", "")
        answer = cur.get("answer", "")
        image_tags = "<image>\n" * self.num_video_frames
        conversations = [
            {"from": "human", "value": f"{image_tags}{prompt}"},
            {"from": "gpt", "value": answer},
        ]
        tok = self.tokenization_func(conversations=conversations, has_image=True)
        out["input_ids"] = tok["input_ids"]
        out["labels"] = tok["labels"]
        return out
