"""NaVILA experiment (reference: exp/navila_exp.py): video-frame navigation
VLA with 8-frame serving history and a nav prompt."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.mem_trainer import length_grouped_batches
from dexbotic_tpu.exp.trainer import Trainer, load_checkpoint_params
from dexbotic_tpu.models import presets
from dexbotic_tpu.models.generate import generate
from dexbotic_tpu.models.navila import (
    FrameHistoryBuffer,
    NaVILAConfig,
    init_navila,
    navila_loss,
    navila_packed_loss,
    navila_packed_loss_cp,
    pack_batch,
)
from dexbotic_tpu.models.vlm import VLMConfig

NAV_PROMPT = (
    "Imagine you are a robot programmed for navigation tasks. You have been given a "
    "video of historical observations and an image of the current observation "
    "<image>. Your assigned task is: {prompt} Analyze this series of images to "
    "decide your next move, which could involve turning left or right by a specific "
    "degree, moving forward a certain distance, or stopping if the task is completed."
)


def nav_question(instruction: str, n_frames: int) -> str:
    """The reference's serving-side navigation question, byte-exact
    (exp/navila_exp.py:327-336): one '<image>\\n' tag per history frame plus
    the current observation tag."""
    interleaved = "<image>\n" * (n_frames - 1)
    return (
        "Imagine you are a robot programmed for navigation tasks. You have been given a video "
        f'of historical observations {interleaved}, and current observation <image>\n. Your assigned task is: "{instruction}" '
        "Analyze this series of images to decide your next action, which could be turning left or right by a specific "
        "degree, moving forward a certain distance, or stop if the task is completed."
    )


@dataclass
class NaVILAModelConfig(base_exp.Config):
    model_name_or_path: Optional[str] = None
    llm_preset: str = "llama2_7b"
    vit_preset: str = "siglip_so400m_384"
    mm_projector_type: str = "mlp_downsample"
    num_video_frames: int = 8
    soft_ce_std: float = 1.0
    use_soft_ce: bool = True
    seed: int = 0
    # training-time sequence packing (reference packs inside its trainer,
    # navila_arch.py:256-360 + exp/navila_trainer.py:64-230)
    use_packing: bool = True
    pack_max_len: int = 0  # 0 -> tokenizer.model_max_length
    samples_per_pack: int = 0  # 0 -> 2x packed rows
    # context parallelism: shard packed sequences over a 'seq' mesh axis and
    # run the decoder with ring attention (parallel/ring.py) — the regime
    # where pack_max_len outgrows one chip's activation HBM.  1 = off.
    context_parallel_seq: int = 1

    def build_config(self) -> NaVILAConfig:
        return NaVILAConfig(
            vlm=VLMConfig(
                llm=presets.LLM_PRESETS[self.llm_preset],
                vit=presets.VIT_PRESETS[self.vit_preset],
                projector_type=self.mm_projector_type,
            ),
            num_video_frames=self.num_video_frames,
            soft_ce_std=self.soft_ce_std,
            use_soft_ce=self.use_soft_ce,
        )

    def build_params(self, cfg):
        if self.model_name_or_path:
            return load_checkpoint_params(self.model_name_or_path)
        return init_navila(jax.random.PRNGKey(self.seed), cfg)


@dataclass
class NaVILADataConfig(base_exp.DataConfig):
    """Video-frame navigation data: DexNavilaDataset instead of DexDataset
    (reference data/dataset/dex_navila_dataset.py)."""

    num_video_frames: int = 8

    def build_data(self, tokenization_func, action_process_func=None):
        from dexbotic_tpu.data.dex_navila_dataset import DexNavilaDataset
        from dexbotic_tpu.data.image_processing import PixelAug, PreprocessRGB

        proc = self.build_image_processor()
        img_fn = PreprocessRGB(
            proc,
            image_aspect_ratio=self.image_aspect_ratio,
            augmentations=PixelAug(self.aug_policy)
            if self.aug_policy and not isinstance(self.aug_policy, list)
            else None,
            image_pad_mode=self.image_pad_mode,
        )
        return DexNavilaDataset(
            dataset_name=self.dataset_name,
            tokenization_func=tokenization_func,
            action_process_func=action_process_func,
            image_process_func=[img_fn] * self.num_video_frames,
            num_video_frames=self.num_video_frames,
            data_keys=self.data_keys,
        )


@dataclass
class NaVILAExp(base_exp.BaseExp):
    exp_name: str = "navila"
    model: NaVILAModelConfig = field(default_factory=NaVILAModelConfig)
    tokenizer: base_exp.TokenizerConfig = field(
        default_factory=lambda: base_exp.TokenizerConfig(
            model_max_length=4096, chat_template="llama_3"
        )
    )
    action: base_exp.ActionConfig = field(
        default_factory=lambda: base_exp.ActionConfig(prompt_template=NAV_PROMPT)
    )
    data: NaVILADataConfig = field(
        default_factory=lambda: NaVILADataConfig(
            num_images=8, image_processor="siglip_384",
            data_keys=["input_ids", "labels", "image"],
        )
    )

    def num_image_tokens(self) -> int:
        return self.model.build_config().vlm.num_image_tokens

    def _digit_ids(self, tokenizer):
        # numeric time tokens for the soft CE (digit byte tokens here;
        # HF tokenizers: the ids of "0".."9")
        return jnp.asarray(
            [tokenizer.encode(str(d))[-1] for d in range(10)], jnp.int32
        )

    def build_model(self, tokenizer):
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)
        digit_ids = self._digit_ids(tokenizer)

        def loss_fn(params, batch, rng):
            return navila_loss(
                params, cfg, batch, rng,
                soft_tokens=digit_ids if self.model.use_soft_ce else None,
                remat=self.trainer.gradient_checkpointing,
            )

        return cfg, params, loss_fn

    # ---- packed training (the 4k-context efficiency path) ----------------

    def train(self):
        """Length-grouped + packed training when use_packing (default):
        K samples per step are greedily packed into R = per_device_batch x
        data-parallel static rows with segment-isolated attention — the
        static-shape equivalent of the reference's repack_multimodal_data
        (navila_arch.py:256-360) driven by its length-grouped sampler
        (exp/navila_trainer.py:64-208)."""
        if not self.model.use_packing:
            return super().train()
        from dexbotic_tpu.parallel import multihost

        multihost.maybe_initialize()
        assert self.trainer.gradient_accumulation_steps == 1, (
            "packed NaVILA training packs the whole step; use more rows "
            "instead of gradient accumulation"
        )
        tokenizer = self.tokenizer.build_tokenizer()
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)
        digit_ids = self._digit_ids(tokenizer)

        cp_seq = max(1, self.model.context_parallel_seq)
        mesh = None
        if cp_seq > 1:
            # 3-axis mesh: fsdp/batch semantics keep their 'data'/'model'
            # axes, the packed-loss shard_map adds 'seq'
            n_dev = len(jax.devices())
            assert n_dev % cp_seq == 0, (n_dev, cp_seq)
            from jax.sharding import Mesh

            mesh = Mesh(
                np.asarray(jax.devices()).reshape(n_dev // cp_seq, 1, cp_seq),
                ("data", "model", "seq"),
            )

        def loss_fn(params, batch, rng):
            soft = digit_ids if self.model.use_soft_ce else None
            if cp_seq > 1:
                return navila_packed_loss_cp(
                    params, cfg, batch, mesh, rng, soft_tokens=soft,
                    remat=self.trainer.gradient_checkpointing,
                )
            return navila_packed_loss(
                params, cfg, batch, rng, soft_tokens=soft,
                remat=self.trainer.gradient_checkpointing,
            )

        dataset = self.data.build_data(self.build_tokenization(tokenizer))
        from dexbotic_tpu.data.collator import Collator

        collator = Collator(
            pad_token_id=tokenizer.pad_token_id,
            max_length=self.tokenizer.model_max_length,
        )
        trainer = Trainer(loss_fn, params, self.trainer, self.optimizer, mesh=mesh)

        R = self.trainer.per_device_batch_size * trainer.mesh.shape["data"]
        K = self.model.samples_per_pack or 2 * R
        max_len = self.pack_max_len_resolved()
        lengths = (
            dataset.length_hints()
            if hasattr(dataset, "length_hints")
            else [1] * len(dataset)
        )

        def batches():
            epoch = 0
            while True:
                for idxs in length_grouped_batches(
                    lengths, K, seed=self.trainer.seed + epoch
                ):
                    if len(idxs) < K:
                        continue
                    items = [dataset[i] for i in idxs]
                    base = collator(items)
                    packed = pack_batch(
                        base["input_ids"], base["labels"],
                        base["attention_mask"].astype(np.int64),
                        num_rows=R, max_len=max_len,
                        pad_token_id=tokenizer.pad_token_id,
                    )
                    packed["images"] = base["images"].astype(np.float32)
                    yield packed
                epoch += 1

        return trainer.train(batches())

    def pack_max_len_resolved(self) -> int:
        return self.model.pack_max_len or self.tokenizer.model_max_length

    def make_generate_fn(self, cfg, params, max_new_tokens: int = 48,
                         eos_token_id: int = 0):
        eos = eos_token_id

        @jax.jit
        def _gen(params, ids, valid, images, rng):
            return generate(
                params["vlm"], cfg.vlm, ids, valid, images,
                max_new_tokens=max_new_tokens, eos_token_id=eos, rng=rng,
            )[0]

        return lambda ids, valid, images, rng: _gen(params, ids, valid, images, rng)


class NaVILAInferenceSession:
    """History buffer + AR text action decoding (exp/navila_exp.py:243-330).

    ``engine``: optional shared ContinuousBatchingEngine — a fleet of
    navigation sessions (one per robot) then coalesces its AR decode steps
    into shared slot ticks instead of serializing whole generate() calls."""

    def __init__(self, exp: NaVILAExp, cfg, params, tokenizer, engine=None,
                 max_new_tokens: int = 32):
        self.exp = exp
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.buffer = FrameHistoryBuffer(cfg.num_video_frames)
        self.engine = engine
        # the reference stops generation at the template stop string
        # (KeywordsStoppingCriteria, exp/navila_exp.py:352-357); when the
        # stop string is a single token we stop there natively
        from dexbotic_tpu.tokenization import conversation as conversation_lib

        conv = conversation_lib.conv_templates[exp.tokenizer.chat_template]
        stop_str = getattr(conv, "sep2", None) or conv.sep
        stop_ids = tokenizer.encode(stop_str, add_bos=False) if stop_str else []
        self.eos_token_id = stop_ids[0] if len(stop_ids) == 1 else 0
        self.max_new_tokens = max_new_tokens  # reference default
        # (exp/navila_exp.py:307 _get_response max_new_tokens=32)
        self.gen = None if engine is not None else exp.make_generate_fn(
            cfg, params, max_new_tokens=max_new_tokens,
            eos_token_id=self.eos_token_id)

    @staticmethod
    def make_shared_engine(cfg, params, slots: int = 8, max_new_tokens: int = 48,
                           max_prompt: int = 2048, prefill_chunk: int = 0):
        from dexbotic_tpu.exp.decode_engine import ContinuousBatchingEngine

        # prefill_chunk: NaVILA history prompts run to 2k tokens — chunked
        # admission (e.g. 512) keeps the fleet's in-flight decodes ticking
        # during those long prefills (exp/decode_engine.py docstring)
        return ContinuousBatchingEngine(
            params["vlm"], cfg.vlm, slots=slots, max_prompt=max_prompt,
            max_new=max_new_tokens, eos_token_id=0,
            prefill_chunk=prefill_chunk or None,
        )

    def reset(self):
        self.buffer.reset()

    def observe(self, frame: np.ndarray):
        """Append a frame WITHOUT running the model (the reference's
        run_model=False request mode, exp/navila_exp.py:260-271)."""
        self.buffer.frames.append(frame)

    def act(self, frame: np.ndarray, instruction: str, rng) -> str:
        from dexbotic_tpu.data.image_processing import preprocess_image
        from dexbotic_tpu.tokenization.tokenize import tokenizer_image_token

        frames = self.buffer.add(frame)
        proc = self.exp.data.build_image_processor()
        imgs = np.stack([preprocess_image(f, proc) for f in frames])
        # reference serving prompt (exp/navila_exp.py:327-345): per-frame
        # '<image>\n' tags inside the nav question, wrapped in the chat
        # template with an EMPTY assistant slot; each tag expands to
        # tokens-per-frame placeholders (static shapes)
        from dexbotic_tpu.tokenization import conversation as conversation_lib

        conv = conversation_lib.conv_templates[self.exp.tokenizer.chat_template].copy()
        conv.append_message(conv.roles[0], nav_question(instruction, len(frames)))
        conv.append_message(conv.roles[1], None)
        ids = tokenizer_image_token(
            conv.get_prompt(), self.tokenizer,
            num_image_tokens=self.cfg.vlm.num_image_tokens,
        )
        if self.engine is not None:
            toks = self.engine.submit(np.asarray(ids, np.int32), images=imgs,
                                      max_new=self.max_new_tokens)
            for stop in (self.eos_token_id, 0):
                if stop in toks:
                    toks = toks[: toks.index(stop)]
            return self._postprocess(self.tokenizer.decode(toks))
        ids = jnp.asarray(ids, jnp.int32)[None]
        valid = jnp.ones(ids.shape, jnp.int32)
        tokens = self.gen(ids, valid, jnp.asarray(imgs)[None], rng)
        return self._postprocess(
            self.tokenizer.decode([int(t) for t in np.asarray(tokens)[0]]))

    def _postprocess(self, text: str) -> str:
        """Reference decode postprocess (exp/navila_exp.py:370-376): strip,
        drop a trailing stop string, strip again."""
        from dexbotic_tpu.tokenization import conversation as conversation_lib

        conv = conversation_lib.conv_templates[self.exp.tokenizer.chat_template]
        stop_str = getattr(conv, "sep2", None) or conv.sep
        text = text.split("\x00")[0] if "\x00" in text else text
        text = text.strip()
        if stop_str and text.endswith(stop_str):
            text = text[: -len(stop_str)]
        return text.strip()


if __name__ == "__main__":
    NaVILAExp.main()
