"""NaVILA: multi-frame navigation VLA (video-frame VLM + text actions).

Behavior pinned to /root/reference/dexbotic/model/navila/navila_arch.py:
SigLIP-SO400M tower + mlp_downsample projector + llama_3 template; per-row
multi-image insertion (our static splice is already per-row, models/vlm.py);
training-time sequence packing (:256-360) — here packed on host into static
rows with SEGMENT-ID isolated attention (ops/attention.py q_seg/kv_seg)
instead of varlen flash attention; soft cross-entropy spreading probability
over numeric 'time' tokens with a Gaussian (loss.py:11-71).  Inference is AR
text decoding over an 8-frame history buffer (exp layer).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

import jax

from dexbotic_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.losses import causal_lm_loss, soft_cross_entropy_gaussian
from dexbotic_tpu.models.vlm import VLMConfig, encode_images, init_vlm
from dexbotic_tpu.nn.transformer import Stream, embed_tokens, lm_logits, mot_forward


@dataclasses.dataclass(frozen=True)
class NaVILAConfig:
    vlm: VLMConfig
    num_video_frames: int = 8
    soft_ce_std: float = 1.0
    use_soft_ce: bool = True


def init_navila(key, cfg: NaVILAConfig, dtype=jnp.float32):
    return {"vlm": init_vlm(key, cfg.vlm, dtype)}


# ---------------------------------------------------------------------------
# Host-side sequence packing (static-shape variant of repack_multimodal_data)
# ---------------------------------------------------------------------------


def pack_batch(
    input_ids: np.ndarray,
    labels: np.ndarray,
    valid: np.ndarray,
    num_rows: int,
    max_len: int,
    pad_token_id: int = 0,
):
    """Greedily pack de-padded sequences (longest-first) into `num_rows` rows.

    Returns dict with packed input_ids/labels/valid/positions/segments plus
    `img_index` — for every IMAGE_TOKEN_INDEX slot, the flattened index of
    its feature row in the [B * tokens_per_sample] image-feature tensor of
    the ORIGINAL (unpacked) batch — all [num_rows, max_len].  Labels at
    segment starts are forced to IGNORE_INDEX so the HF-style global shift
    never supervises a cross-segment target (matches unpacked semantics).
    Sequences that don't fit the static budget are dropped with a warning.
    """
    B = input_ids.shape[0]
    lens = valid.sum(1).astype(int)
    order = np.argsort(-lens)
    # per-sample image-token budget (constant across samples for a static map)
    n_img = (input_ids == IMAGE_TOKEN_INDEX).sum(1).astype(int)
    tokens_per_sample = int(n_img.max()) if B else 0

    out_ids = np.full((num_rows, max_len), pad_token_id, input_ids.dtype)
    out_labels = np.full((num_rows, max_len), IGNORE_INDEX, labels.dtype)
    out_valid = np.zeros((num_rows, max_len), np.int32)
    out_pos = np.zeros((num_rows, max_len), np.int32)
    out_seg = np.full((num_rows, max_len), -1, np.int32)
    out_img = np.zeros((num_rows, max_len), np.int32)
    row_fill = np.zeros(num_rows, int)
    seg_counter = 0
    for i in order:
        L = lens[i]
        # first row with space
        placed = False
        for r in range(num_rows):
            if row_fill[r] + L <= max_len:
                s = row_fill[r]
                sel = valid[i].astype(bool)
                seq = input_ids[i][sel]
                out_ids[r, s : s + L] = seq
                out_labels[r, s : s + L] = labels[i][sel]
                out_labels[r, s] = IGNORE_INDEX  # cross-segment guard
                out_valid[r, s : s + L] = 1
                out_pos[r, s : s + L] = np.arange(L)
                out_seg[r, s : s + L] = seg_counter
                is_img = seq == IMAGE_TOKEN_INDEX
                out_img[r, s : s + L] = np.where(
                    is_img, i * tokens_per_sample + np.cumsum(is_img) - 1, 0
                )
                row_fill[r] += L
                seg_counter += 1
                placed = True
                break
        if not placed:
            import warnings

            warnings.warn(f"pack_batch: dropped sequence of length {L}")
    return {
        "input_ids": out_ids,
        "labels": out_labels,
        "attention_mask": out_valid,
        "positions": out_pos,
        "segments": out_seg,
        "img_index": out_img,
    }


def navila_forward_packed(params, cfg: NaVILAConfig, packed: dict, images_embeds=None, remat=False):
    """Forward over packed rows with segment-isolated causal attention."""
    ids = packed["input_ids"]
    valid = packed["attention_mask"].astype(jnp.int32)
    seg = packed["segments"]
    positions = packed["positions"]
    if images_embeds is None:
        raise ValueError("packed forward expects pre-spliced embeddings")
    # causal within each segment: grp = position+1 (per segment), plus seg ids
    grp = positions + 1
    outs, _ = mot_forward(
        [Stream(cfg.vlm.llm, params["vlm"]["llm"], images_embeds)],
        positions=positions, q_grp=grp, q_valid=valid, remat=remat,
        q_seg=seg,
    )
    return outs[0]


def _packed_embeds(params, cfg: NaVILAConfig, batch: dict) -> jnp.ndarray:
    """ViT encode + gather-splice of image features into packed rows [R, L, H]."""
    feats = encode_images(params["vlm"], cfg.vlm, batch["images"])  # [K, NT, H]
    K, NT, H = feats.shape
    feats_flat = feats.reshape(K * NT, H)

    ids = batch["input_ids"]
    is_img = ids == IMAGE_TOKEN_INDEX
    safe_ids = jnp.where(is_img, 0, ids)
    text = embed_tokens(params["vlm"]["llm"], cfg.vlm.llm, safe_ids)
    idx = jnp.clip(batch["img_index"], 0, K * NT - 1)
    gathered = jnp.take(feats_flat.astype(text.dtype), idx, axis=0)
    return jnp.where(is_img[..., None], gathered, text)


def navila_packed_loss(
    params,
    cfg: NaVILAConfig,
    batch: dict,
    rng=None,
    soft_tokens: Optional[jnp.ndarray] = None,
    remat: bool = False,
):
    """Training loss over PACKED rows (the reference packs inside its trainer,
    navila_arch.py:256-360 + exp/navila_trainer.py:64-230; here packing is a
    host-side collate and the device program is static-shape).

    batch: pack_batch outputs (input_ids/labels/attention_mask/positions/
    segments/img_index, [R, L]) + "images" [K, n_frames, H, W, 3] for the K
    ORIGINAL samples.  Image features are gathered into the packed rows via
    img_index, so the VLM encode stays one batched ViT call.
    """
    embeds = _packed_embeds(params, cfg, batch)
    hidden = navila_forward_packed(params, cfg, batch, images_embeds=embeds, remat=remat)
    logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hidden)
    if cfg.use_soft_ce and soft_tokens is not None:
        loss = soft_cross_entropy_gaussian(
            logits, batch["labels"], soft_tokens, std=cfg.soft_ce_std
        )
    else:
        loss = causal_lm_loss(logits, batch["labels"])
    return loss, {"text_loss": loss, "loss": loss}


def navila_packed_loss_cp(
    params,
    cfg: NaVILAConfig,
    batch: dict,
    mesh,
    rng=None,
    soft_tokens: Optional[jnp.ndarray] = None,
    remat: bool = False,
    data_axis: str = "data",
    seq_axis: str = "seq",
):
    """Context-parallel packed loss: sequences sharded over `seq_axis`.

    Numerically equal to navila_packed_loss on the same batch (same global
    masked-mean), but the decoder runs with ring attention
    (parallel/ring.py) inside shard_map, so per-device activation memory is
    O(L / seq) — the regime where packed contexts outgrow one chip's HBM.
    The ViT encode + gather-splice stay OUTSIDE shard_map under plain GSPMD
    (the gather crosses shard boundaries; XLA places the collectives).
    Labels are pre-shifted at full length so the HF next-token shift never
    crosses a shard edge, then the per-token NLL (losses.token_nll) reduces
    with psum over (data, seq).
    """
    from dexbotic_tpu.models.losses import token_nll
    from jax.sharding import PartitionSpec as P

    llm_cp = dataclasses.replace(cfg.vlm.llm, attn_impl=f"ring:{seq_axis}")
    embeds = _packed_embeds(params, cfg, batch)

    labels = batch["labels"]
    R, L = labels.shape
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full((R, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )
    valid = batch["attention_mask"]
    positions = batch["positions"]
    seg = batch["segments"]
    grp = positions + 1  # causal within each segment
    use_soft = soft_tokens is not None
    std = cfg.soft_ce_std

    def local(llm_params, embeds, shifted, positions, grp, valid, seg, soft):
        outs, _ = mot_forward(
            [Stream(llm_cp, llm_params, embeds)],
            positions=positions, q_grp=grp, q_valid=valid, remat=remat,
            q_seg=seg,
        )
        logits = lm_logits(llm_params, llm_cp, outs[0])
        nll, mask = token_nll(logits, shifted,
                              soft_tokens=soft if use_soft else None, std=std)
        s = jax.lax.psum(jnp.sum(jnp.where(mask, nll, 0.0)),
                         (data_axis, seq_axis))
        c = jax.lax.psum(jnp.sum(mask), (data_axis, seq_axis))
        return s / jnp.maximum(c, 1)

    s2 = P(data_axis, seq_axis)
    s3 = P(data_axis, seq_axis, None)
    soft_arg = soft_tokens if use_soft else jnp.zeros((1,), jnp.int32)
    loss = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), s3, s2, s2, s2, s2, s2, P(None)),
        out_specs=P(),
    )(params["vlm"]["llm"], embeds, shifted, positions, grp, valid, seg,
      soft_arg)
    return loss, {"text_loss": loss, "loss": loss}


def navila_loss(
    params,
    cfg: NaVILAConfig,
    batch: dict,
    rng=None,
    soft_tokens: Optional[jnp.ndarray] = None,
    remat: bool = False,
):
    """VLM CE (or NaVILA soft-CE over numeric time tokens) on video-frame
    conversations.  batch images: [B, n_frames, H, W, 3]."""
    hidden = _navila_hidden(params, cfg, batch, remat)
    logits = lm_logits(params["vlm"]["llm"], cfg.vlm.llm, hidden)
    if cfg.use_soft_ce and soft_tokens is not None:
        loss = soft_cross_entropy_gaussian(
            logits, batch["labels"], soft_tokens, std=cfg.soft_ce_std
        )
    else:
        loss = causal_lm_loss(logits, batch["labels"])
    return loss, {"text_loss": loss, "loss": loss}


def _navila_hidden(params, cfg, batch, remat):
    from dexbotic_tpu.models.vlm import vlm_forward

    hidden, _ = vlm_forward(
        params["vlm"], cfg.vlm, batch["input_ids"], batch["attention_mask"],
        images=batch["images"], remat=remat,
    )
    return hidden


class FrameHistoryBuffer:
    """Serving-side rolling frame history, reference-exact
    (exp/navila_exp.py:242-257 sample_and_pad_images): short histories are
    padded with BLACK frames at the FRONT, then `num_frames - 1` history
    slots are sampled with ``linspace(0, n-1, endpoint=False)`` and the
    LATEST frame is always appended last."""

    def __init__(self, num_frames: int = 8, pad_frame=None):
        self.num_frames = num_frames
        self.pad_frame = pad_frame  # None -> zeros like the first frame
        self.frames: list = []

    def reset(self):
        self.frames = []

    def add(self, frame) -> list:
        self.frames.append(frame)
        return self.sample()

    def sample(self) -> list:
        frames = list(self.frames)
        if len(frames) < self.num_frames:
            pad = self.pad_frame
            if pad is None:
                pad = np.zeros_like(np.asarray(frames[0]))
            frames = [pad] * (self.num_frames - len(frames)) + frames
        idx = np.linspace(0, len(frames) - 1, num=self.num_frames - 1,
                          endpoint=False, dtype=int)
        return [frames[i] for i in idx] + [frames[-1]]


def parse_nav_action(text: str) -> list:
    """Generated navigation text -> env action-int queue, reference-exact
    (exp/navila_exp.py:376-437): 0 stop / 1 forward / 2 left / 3 right; a
    'move forward N cm' repeats action 1 N//25 times (N snapped to
    {25,50,75}), turns repeat N//15 times (snapped to {15,30,45}); defaults
    25 cm / 15 degrees when the magnitude is missing; unrecognized text maps
    to [0] (the reference's else branch)."""
    import re as _re

    patterns = {
        0: _re.compile(r"\bstop\b", _re.IGNORECASE),
        1: _re.compile(r"\bis move forward\b", _re.IGNORECASE),
        2: _re.compile(r"\bis turn left\b", _re.IGNORECASE),
        3: _re.compile(r"\bis turn right\b", _re.IGNORECASE),
    }
    action = None
    for a, pat in patterns.items():
        if pat.search(text):
            action = a
            break

    def _magnitude(pattern, default, steps):
        m = _re.search(pattern, text)
        try:
            v = int(m.group(1))
        except (AttributeError, ValueError):
            v = default
        if v % steps[0] != 0:
            v = min(steps, key=lambda x: abs(x - v))
        return v

    queue = []
    if action == 1:
        d = _magnitude(r"move forward (\d+) cm", 25, [25, 50, 75])
        queue += [1] * (d // 25)
    elif action == 2:
        d = _magnitude(r"turn left (\d+) degree", 15, [15, 30, 45])
        queue += [2] * (d // 15)
    elif action == 3:
        d = _magnitude(r"turn right (\d+) degree", 15, [15, 30, 45])
        queue += [3] * (d // 15)
    else:
        queue.append(0)
    return queue
