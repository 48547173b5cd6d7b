"""Experiment layer: layered dataclass configs + factory wiring + task dispatch.

Keeps the reference's advertised user contract ("layered configuration +
factory registration + entry dispatch", README.md:24; config surface
/root/reference/dexbotic/exp/base_exp.py): users subclass the config
dataclasses and override fields; `python exp.py --task {train,inference,
inference_single,compute_norm_stats}` dispatches.
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import os
import random
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Union

import jax
import numpy as np

from dexbotic_tpu.data import transforms as T
from dexbotic_tpu.data.collator import Collator
from dexbotic_tpu.data.dexdata import DexDataset
from dexbotic_tpu.data.image_processing import (
    DummyRGBProcessor,
    ImageProcessorConfig,
    PixelAug,
    PreprocessRGB,
)
from dexbotic_tpu.data.multimodal import LoadMultiModal
from dexbotic_tpu.data import normalize
from dexbotic_tpu.data.transforms import DEFAULT_PROMPT_TEMPLATE
from dexbotic_tpu.exp.optim import OptimizerConfig
from dexbotic_tpu.exp.trainer import Trainer, TrainerConfig
from dexbotic_tpu.tokenization.tokenize import (
    DummyTokenization,
    LLMTokenization,
    SimpleTokenizer,
)


@dataclass
class Config:
    pass


@dataclass
class TokenizerConfig(Config):
    tokenizer_path: Optional[str] = None  # local HF tokenizer dir, else SimpleTokenizer
    model_max_length: int = 2048
    use_special_tokens: bool = False
    chat_template: str = "dexbotic"

    def build_tokenizer(self):
        if self.tokenizer_path:
            import os

            # a raw sentencepiece .model file (e.g. Gemma's tokenizer.model,
            # the only artifact the reference's Pi0Tokenization needs —
            # dexbotic/tokenization/process.py:116) loads without the native
            # sentencepiece package via the pure-Python reader
            sp_path = self.tokenizer_path
            if os.path.isdir(sp_path):
                cand = os.path.join(sp_path, "tokenizer.model")
                has_hf = any(os.path.exists(os.path.join(sp_path, f))
                             for f in ("tokenizer.json", "tokenizer_config.json"))
                sp_path = cand if (os.path.exists(cand) and not has_hf) else None
            elif not sp_path.endswith(".model"):
                sp_path = None
            if sp_path:
                from dexbotic_tpu.tokenization.spm import SpmTokenizer

                return SpmTokenizer(sp_path, model_max_length=self.model_max_length)
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(self.tokenizer_path, use_fast=True)
            tok.model_max_length = self.model_max_length
            if tok.pad_token_id is None:
                tok.pad_token = tok.eos_token
            return tok
        tok = SimpleTokenizer(model_max_length=self.model_max_length)
        # llama_3-style templates are built from <|...|> marker strings; real
        # HF tokenizers carry those as single special tokens, and the serving
        # stop logic (navila_exp.py KeywordsStoppingCriteria parity) relies on
        # the stop string being ONE id — register the template's markers
        import re as _re

        from dexbotic_tpu.tokenization import conversation as conversation_lib

        conv = conversation_lib.conv_templates.get(self.chat_template)
        if conv is not None:
            marks: set = set()
            for s in (conv.system, conv.sep, getattr(conv, "sep2", None) or "",
                      *conv.roles):
                marks.update(_re.findall(r"<\|[^|>]+\|>", s or ""))
            if marks:
                tok.add_special_tokens(sorted(marks))
        return tok

    def add_special_tokens(self, tokenizer, tokens: list[str]) -> int:
        if hasattr(tokenizer, "add_special_tokens") and not isinstance(
            tokenizer, SimpleTokenizer
        ):
            return tokenizer.add_special_tokens({"additional_special_tokens": tokens})
        return tokenizer.add_special_tokens(tokens)


@dataclass
class ActionConfig(Config):
    statistic_mapping: Optional[str] = None  # path to norm_stats.json
    replace_with_default_answer: str = " "
    trajectory_length: int = 16
    delta: bool = True
    trajectory_padding_mode: str = "zero"
    padding_action: bool = False
    vocab_size: int = 255
    string_format: str = " {value}"
    prompt_template: Union[str, Callable] = DEFAULT_PROMPT_TEMPLATE
    load_multimodal_masks: bool = False

    def _read_norm_stats(self, path):
        assert path and os.path.exists(path), f"norm stats not found: {path}"
        with open(path) as f:
            return T.ToNumpy()(json.load(f)["norm_stats"])

    def build_action_process_func(self) -> T.Pipeline:
        stats = self._read_norm_stats(self.statistic_mapping)
        return T.Pipeline(
            [
                T.ToDict(),
                T.ToNumpy(),
                T.AddAction(predict_length=1),
                T.DeltaAction(enable=self.delta),
                T.AddTrajectory(
                    trajectory_length=self.trajectory_length,
                    padding_mode=self.trajectory_padding_mode,
                    padding_action=self.padding_action,
                ),
                T.ActionNormAnd2String(
                    statistic_mapping=stats,
                    vocab_size=self.vocab_size,
                    string_format=self.string_format,
                ),
                LoadMultiModal(return_masks=self.load_multimodal_masks),
                T.AddPromptTemplate(prompt_template=self.prompt_template),
                T.ReplaceAnswer(default_answer=self.replace_with_default_answer),
                T.ToList(),
            ]
        )


@dataclass
class ComputeNormActionConfig(ActionConfig):
    norm_method: str = "default"  # 'default' (q01/q99) | 'minmax'
    norm_save_path: str = field(
        default_factory=lambda: os.path.join(
            "norm_assets", time.strftime("%m%d-%H%M") + "-default"
        )
    )
    max_batches: int = 500
    batch_size: int = 128

    def build_action_process_func(self) -> T.Pipeline:
        return T.Pipeline(
            [
                T.ToDict(),
                T.ToNumpy(),
                T.AddAction(predict_length=1),
                T.DeltaAction(enable=self.delta),
                T.ToList(),
            ]
        )

    def compute_norm_stats(self, dataset_name: str) -> str:
        """Stream samples through RunningStats; write the merged q01/q99
        envelope norm_stats.json (base_exp.py:453-545 behavior)."""
        fn = self.build_action_process_func()

        norm_files = {}
        for name in dataset_name.split("+"):
            if name.startswith("general"):
                continue
            ds = DexDataset(
                dataset_name=name,
                tokenization_func=DummyTokenization(),
                action_process_func=fn,
                image_process_func=DummyRGBProcessor(),
                data_keys=["action"],
            )
            stats = normalize.RunningStats()
            n = min(len(ds), self.max_batches * self.batch_size)
            order = random.Random(0).sample(range(len(ds)), n)
            buf = []
            for i in order:
                buf.append(np.asarray(ds[i]["action"], np.float64).reshape(-1))
                if len(buf) == self.batch_size:
                    stats.update(np.stack(buf))
                    buf = []
            if buf:
                stats.update(np.stack(buf))
            ns = {"action": stats.get_statistics()}
            save_dir = os.path.join(self.norm_save_path, name)
            normalize.save(save_dir, ns)
            norm_files[name] = os.path.join(save_dir, "norm_stats.json")

        lo_list, hi_list = [], []
        for name, f in norm_files.items():
            with open(f) as fh:
                st = json.load(fh)["norm_stats"]["action"]
            if self.norm_method == "default":
                lo_list.append(st["q01"])
                hi_list.append(st["q99"])
            else:
                lo_list.append(st["min"])
                hi_list.append(st["max"])
        merged = {
            "default": {
                "min": np.array(lo_list).min(0).tolist(),
                "max": np.array(hi_list).max(0).tolist(),
            }
        }
        out = os.path.join(self.norm_save_path, "norm_stats.json")
        os.makedirs(self.norm_save_path, exist_ok=True)
        with open(out, "w") as fh:
            json.dump({"norm_stats": merged}, fh, indent=2)
        return out


@dataclass
class DataConfig(Config):
    dataset_name: Optional[str] = None
    num_images: int = 1
    aug_policy: Union[str, list, None] = "identity"
    image_aspect_ratio: Optional[str] = "pad"
    image_pad_mode: str = "mean"
    image_processor: str = "siglip_224"  # key into _PROCESSORS or size int
    data_keys: list = field(default_factory=lambda: ["input_ids", "labels", "action", "image"])
    images_keys: Optional[list] = None
    shuffle: bool = True
    seed: int = 42
    # parallel host decode (reference: DataLoader num_workers, TrainingArgs
    # dataloader_num_workers=64, exp/base_exp.py:453-503).  0 = in-line
    # sequential fetch; >0 = data.loader.DataLoader with this many workers.
    num_workers: int = 0
    worker_mode: str = "thread"  # 'thread' | 'process' (forked decode procs)

    _PROCESSORS = {
        "clip_336": ImageProcessorConfig.clip_336(),
        "siglip_384": ImageProcessorConfig.siglip(384),
        "siglip_224": ImageProcessorConfig.siglip(224),
    }

    def build_image_processor(self) -> ImageProcessorConfig:
        if isinstance(self.image_processor, ImageProcessorConfig):
            return self.image_processor
        if isinstance(self.image_processor, str) and self.image_processor in self._PROCESSORS:
            return self._PROCESSORS[self.image_processor]
        return ImageProcessorConfig(size=int(self.image_processor))

    def build_data(self, tokenization_func, action_process_func) -> DexDataset:
        proc = self.build_image_processor()
        policies = (
            self.aug_policy
            if isinstance(self.aug_policy, list)
            else [self.aug_policy] * self.num_images
        )
        img_fns = [
            PreprocessRGB(
                proc,
                image_aspect_ratio=self.image_aspect_ratio,
                augmentations=PixelAug(p) if p else None,
                image_pad_mode=self.image_pad_mode,
            )
            for p in policies
        ]
        return DexDataset(
            dataset_name=self.dataset_name,
            tokenization_func=tokenization_func,
            action_process_func=action_process_func,
            image_process_func=img_fns,
            num_images=self.num_images,
            data_keys=self.data_keys,
            images_keys=self.images_keys,
        )


def data_iterator(
    dataset,
    collator,
    batch_size: int,
    seed: int = 42,
    epochs: int = 10**6,
    process_id: int = 0,
    process_count: int = 1,
):
    """Shuffled epoch iterator yielding collated numpy batches.

    batch_size is the GLOBAL per-step batch; with process_count > 1 each
    process collates only its own contiguous slice of every global batch
    (the DistributedSampler analogue — same seed => same permutation on all
    hosts, disjoint rows per host)."""
    n = len(dataset)
    rng = random.Random(seed)
    local = batch_size // process_count
    lo, hi = process_id * local, (process_id + 1) * local
    for _ in range(epochs):
        order = list(range(n))
        rng.shuffle(order)
        for i in range(0, n - batch_size + 1, batch_size):
            yield collator([dataset[j] for j in order[i + lo : i + hi]])


@dataclass
class BaseExp:
    """Compose the config blocks; subclass + override per policy/benchmark."""

    exp_name: str = "base_exp"
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
    action: ActionConfig = field(default_factory=ActionConfig)
    data: DataConfig = field(default_factory=DataConfig)
    # "" = bf16 serving (the reference's policy, exp/base_exp.py:714-760);
    # "int8" = weight-only int8 (ops/quant.py) — halves weight HBM, fits the
    # 7B class on one 16 GB v5e chip.  TPU-native extension, no ref analogue.
    inference_quantize: str = ""
    inference_quantize_min_size: int = 1 << 16  # skip weights smaller than this
    # >1 coalesces concurrent single-frame requests into one padded device
    # call (exp/serve.py micro-batching; batched inference is ~3x at 1b)
    serve_micro_batch: int = 0

    def prepare_inference_params(self, params):
        """Serving dtype policy: big tensors -> bf16 (scalars/1-D stay fp32),
        then optional weight-only int8 quantization."""
        import jax.numpy as jnp

        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2
            else jnp.asarray(x),
            params,
        )
        if self.inference_quantize in ("int8", "w8a8"):
            from dexbotic_tpu.ops.quant import quantize_params

            params = quantize_params(
                params, min_size=self.inference_quantize_min_size, in_place=True
            )
            if self.inference_quantize == "w8a8":
                # batched-prefill matmuls additionally run int8 activations
                # on the int8 MXU (trace-time dispatch; configure before the
                # serving program first compiles)
                from dexbotic_tpu.ops import quant_matmul

                quant_matmul.W8A8_MIN_ROWS = 2048
        elif self.inference_quantize:
            raise ValueError(f"unknown inference_quantize={self.inference_quantize!r}")
        return params

    # ---- hooks each policy exp implements --------------------------------

    def build_model(self, tokenizer):  # -> (config_obj, params, loss_fn)
        raise NotImplementedError

    def build_tokenization(self, tokenizer):
        return LLMTokenization(
            tokenizer,
            chat_template=self.tokenizer.chat_template,
            num_image_tokens=self.num_image_tokens(),
        )

    def num_image_tokens(self) -> int:
        return 1

    # ---- norm stats ------------------------------------------------------

    def _auto_compute_norm_stats(self, poll_timeout_s: float = 1800.0):
        """Compute (or reuse cached) norm stats keyed by dataset_name md5.

        Multi-host: only the primary process computes and writes; the others
        poll for the finished file (reference rank0-computes-others-poll,
        base_exp.py:837-855) so concurrent writes to the shared cache can't
        race."""
        if self.action.statistic_mapping and os.path.exists(self.action.statistic_mapping):
            return
        key = hashlib.md5(self.data.dataset_name.encode()).hexdigest()[:16]
        cache_dir = os.path.join("norm_assets", f"auto-{key}")
        out = os.path.join(cache_dir, "norm_stats.json")
        if not os.path.exists(out):
            from dexbotic_tpu.parallel import multihost

            if multihost.is_primary():
                cfg = ComputeNormActionConfig(
                    delta=self.action.delta, norm_save_path=cache_dir
                )
                cfg.compute_norm_stats(self.data.dataset_name)
            else:
                t0 = time.time()
                while not os.path.exists(out):
                    if time.time() - t0 > poll_timeout_s:
                        raise TimeoutError(
                            f"norm stats {out} not produced by primary"
                        )
                    time.sleep(2.0)
        self.action.statistic_mapping = out

    # ---- tasks -----------------------------------------------------------

    def train(self):
        from dexbotic_tpu.parallel import multihost

        multihost.maybe_initialize()  # no-op unless DEXBOTIC_COORDINATOR set
        self._auto_compute_norm_stats()
        tokenizer = self.tokenizer.build_tokenizer()
        model_cfg, params, loss_fn = self.build_model(tokenizer)
        action_fn = self.action.build_action_process_func()
        dataset = self.data.build_data(self.build_tokenization(tokenizer), action_fn)
        collator = Collator(
            pad_token_id=tokenizer.pad_token_id,
            max_length=self.tokenizer.model_max_length,
        )
        with open(self.action.statistic_mapping) as f:
            norm_stats_json = f.read()
        trainer = Trainer(
            loss_fn,
            params,
            self.trainer,
            self.optimizer,
            norm_stats_json=norm_stats_json,
        )
        # per-step global batch = microbatch x data-parallel x accumulation
        batch_size = (
            self.trainer.per_device_batch_size
            * trainer.mesh.shape["data"]
            * self.trainer.gradient_accumulation_steps
        )
        if self.data.num_workers > 0:
            from dexbotic_tpu.data.loader import DataLoader

            it = iter(DataLoader(
                dataset,
                collator,
                batch_size,
                num_workers=self.data.num_workers,
                worker_mode=self.data.worker_mode,
                seed=self.trainer.seed,
                epochs=10**6,
                process_id=jax.process_index(),
                process_count=jax.process_count(),
            ))
        else:
            it = data_iterator(
                dataset,
                collator,
                batch_size,
                seed=self.trainer.seed,
                process_id=jax.process_index(),
                process_count=jax.process_count(),
            )
        return trainer.train(it)

    def compute_norm_stats(self):
        cfg = ComputeNormActionConfig(delta=self.action.delta)
        return cfg.compute_norm_stats(self.data.dataset_name)

    def inference(self):
        raise NotImplementedError("policy exp must implement inference()")

    def inference_single(self):
        raise NotImplementedError("policy exp must implement inference_single()")

    # ---- CLI -------------------------------------------------------------

    @classmethod
    def main(cls, **overrides):
        parser = argparse.ArgumentParser()
        parser.add_argument(
            "--task",
            default="train",
            choices=["train", "inference", "inference_single", "compute_norm_stats"],
        )
        args, _ = parser.parse_known_args()
        exp = cls(**overrides)
        return getattr(exp, args.task)()
