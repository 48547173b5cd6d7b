import json
import os

import numpy as np
import pytest

from dexbotic_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from dexbotic_tpu.data import transforms as T
from dexbotic_tpu.data.collator import Collator
from dexbotic_tpu.data.dexdata import DexDataset
from dexbotic_tpu.data.image_processing import (
    ImageProcessorConfig,
    PreprocessRGB,
    expand2square,
    preprocess_image,
)
from dexbotic_tpu.data.normalize import (
    NormStats,
    RunningStats,
    deserialize_json,
    serialize_json,
)
from dexbotic_tpu.data.registry import CONVERSATION_DATA, register_dataset
from dexbotic_tpu.tokenization.tokenize import (
    LLMTokenization,
    SimpleTokenizer,
    tokenize_dexbotic,
    tokenizer_image_token,
)


# ---------------------------------------------------------------- transforms


def _episode(n=6, d=3):
    state = np.arange(n * d, dtype=np.float64).reshape(n, d)
    return {
        "state": state,
        "prompt": [f"do the thing"] * n,
        "is_robot": [True] * n,
        "meta_data": {"non_delta_mask": [2], "periodic_mask": None, "periodic_range": None,
                      "dataset": "test"},
    }


def test_add_action_shifts_state():
    ep = T.AddAction(predict_length=1)(_episode())
    np.testing.assert_array_equal(ep["action"], ep["abs_action"])
    np.testing.assert_array_equal(ep["action"][0], [3, 4, 5])
    assert len(ep["state"]) == len(ep["action"]) == 5


def test_delta_action_non_delta_mask():
    ep = T.AddAction(1)(_episode())
    ep = T.DeltaAction(enable=True)(ep)
    # delta dims are state[t+1]-state[t] = 3; non-delta dim 2 keeps absolute
    np.testing.assert_array_equal(ep["action"][0], [3, 3, 5])


def test_delta_action_periodic_wrap():
    ep = _episode(3, 2)
    ep["meta_data"].update(periodic_mask=[0], periodic_range=2 * np.pi, non_delta_mask=None)
    ep["state"] = np.array([[3.0, 0.0], [-3.0, 1.0], [3.0, 2.0]])
    ep = T.AddAction(1)(ep)
    ep = T.DeltaAction(enable=True)(ep)
    # -3 - 3 = -6 -> wraps to -6 + 2pi ~= 0.283
    np.testing.assert_allclose(ep["action"][0, 0], -6 + 2 * np.pi, rtol=1e-6)


def test_add_trajectory_last_padding():
    ep = T.AddAction(1)(_episode(4, 2))  # 3 actions
    ep = T.AddTrajectory(trajectory_length=3, flatten=False, padding_action=True)(ep)
    traj = ep["trajectory"]
    assert traj.shape == (3, 3, 2)
    # last row pads with final action
    np.testing.assert_array_equal(traj[2, 0], traj[2, 1])


def test_add_trajectory_flatten():
    ep = T.AddAction(1)(_episode(5, 2))
    ep = T.AddTrajectory(trajectory_length=2, flatten=True, padding_action=True)(ep)
    assert ep["action"].shape == (4, 4)


def test_action_norm_and_2string():
    ep = T.AddAction(1)(_episode())
    t = T.ActionNormAnd2String(
        statistic_mapping={"default": {"min": [0, 0, 0], "max": [15, 15, 15]}},
        vocab_size=255,
    )
    ep = t(ep)
    assert ep["action"].min() >= -1 and ep["action"].max() <= 1
    assert isinstance(ep["answer"][0], str) and len(ep["answer"][0].split()) == 3


def test_prompt_template():
    ep = _episode()
    ep = T.AddPromptTemplate()(ep)
    assert ep["prompt"][0] == "<image>\nWhat action should the robot take to do the thing?"


def test_pipeline_hoists_attrs():
    pipe = T.Pipeline([T.AddAction(predict_length=3)])
    assert pipe.predict_length == 3


def test_to_dict_to_list_roundtrip():
    frames = [{"a": i, "b": f"s{i}"} for i in range(3)]
    ep = T.ToDict()(frames, meta_data={"x": 1})
    ep["prompt"] = ["p"] * 3
    out = T.ToList()(ep)
    assert out[1]["a"] == 1 and out[2]["b"] == "s2"


def test_output_transforms():
    data = {
        "action": np.array([[0.5, 0.5]]),
        "state": np.array([1.0, 2.0]),
        "meta_data": {"non_delta_mask": [1], "periodic_mask": None, "periodic_range": None},
    }
    out = T.AbsoluteAction()(dict(data))
    np.testing.assert_allclose(out["action"], [[1.5, 0.5]])
    den = T.ActionDenorm({"default": {"min": [0, 0], "max": [10, 10]}})(
        {"action": np.array([[0.0, 1.0]])}
    )
    np.testing.assert_allclose(den["action"], [[5.0, 10.0]])


# ---------------------------------------------------------------- normalize


def test_running_stats_vs_numpy():
    rng = np.random.RandomState(0)
    data = rng.randn(5000, 3) * [1, 5, 0.1] + [0, 10, -2]
    rs = RunningStats()
    for i in range(0, 5000, 500):
        rs.update(data[i : i + 500])
    st = rs.get_statistics()
    np.testing.assert_allclose(st.mean, data.mean(0), rtol=1e-6)
    np.testing.assert_allclose(st.std, data.std(0), rtol=1e-6)
    np.testing.assert_allclose(st.min, data.min(0), rtol=1e-6)
    np.testing.assert_allclose(st.max, data.max(0), rtol=1e-6)
    np.testing.assert_allclose(st.q01, np.quantile(data, 0.01, axis=0), atol=0.05)
    np.testing.assert_allclose(st.q99, np.quantile(data, 0.99, axis=0), atol=0.05)


def test_norm_stats_json_roundtrip():
    st = NormStats(mean=np.array([1.0]), std=np.array([2.0]), q01=np.array([0.1]),
                   q99=np.array([9.9]), min=np.array([0.0]), max=np.array([10.0]))
    s = serialize_json({"default": st})
    back = deserialize_json(s)
    np.testing.assert_allclose(back["default"].q99, [9.9])


# ---------------------------------------------------------------- images


def test_expand2square():
    img = np.ones((4, 8, 3), np.uint8) * 200
    sq = expand2square(img, (0, 0, 0))
    assert sq.shape == (8, 8, 3)
    assert (sq[0] == 0).all() and (sq[2] == 200).all()


def test_preprocess_image_normalization():
    cfg = ImageProcessorConfig(size=8, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    img = np.full((8, 8, 3), 255, np.uint8)
    out = preprocess_image(img, cfg)
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)
    assert out.shape == (8, 8, 3)


def test_preprocess_rgb_none_gives_zeros():
    pp = PreprocessRGB(ImageProcessorConfig(size=8))
    out = pp(None)
    assert out.shape == (8, 8, 3) and (out == 0).all()


# ---------------------------------------------------------------- tokenizer


def test_simple_tokenizer_roundtrip():
    tok = SimpleTokenizer()
    ids = tok.encode("hello <|endoftext|>")
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids) == "hello <|endoftext|>"


def test_tokenizer_image_token_expansion():
    tok = SimpleTokenizer()
    ids1 = tokenizer_image_token("<image>\nhi", tok, num_image_tokens=1)
    ids4 = tokenizer_image_token("<image>\nhi", tok, num_image_tokens=4)
    assert ids1.count(IMAGE_TOKEN_INDEX) == 1
    assert ids4.count(IMAGE_TOKEN_INDEX) == 4
    # non-image tokens identical
    assert [i for i in ids1 if i != IMAGE_TOKEN_INDEX] == [
        i for i in ids4 if i != IMAGE_TOKEN_INDEX
    ]


def test_tokenize_dexbotic_masks_instruction():
    tok = SimpleTokenizer()
    conv = [[{"from": "human", "value": "<image>\ndo x"}, {"from": "gpt", "value": "42"}]]
    out = tokenize_dexbotic(conv, tok, has_image=True, num_image_tokens=2)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 2
    # instruction span masked, answer span not
    assert (labels == IGNORE_INDEX).sum() > 0
    kept = labels[labels != IGNORE_INDEX]
    assert len(kept) > 0
    assert "42" in tok.decode([i for i in kept])


def test_llm_tokenization_wrapper():
    tok = SimpleTokenizer()
    f = LLMTokenization(tok)
    out = f(conversations=[{"from": "human", "value": "<image>\ngo"}, {"from": "gpt", "value": "ok"}])
    assert out["input_ids"].ndim == 1


# ---------------------------------------------------------------- collator


def test_collator_fixed_shapes():
    c = Collator(pad_token_id=0, max_length=10)
    batch = c(
        [
            {"input_ids": np.array([1, 2, 3]), "labels": np.array([1, 2, 3]),
             "image": np.zeros((4, 4, 3)), "action": np.ones((2, 7))},
            {"input_ids": np.array([4, 5]), "labels": np.array([IGNORE_INDEX, 5]),
             "image": np.zeros((4, 4, 3)), "action": np.ones((2, 7))},
        ]
    )
    assert batch["input_ids"].shape == (2, 10)
    assert batch["attention_mask"].sum() == 5
    assert batch["actions"].shape == (2, 2, 7)
    assert batch["labels"][1, 2] == IGNORE_INDEX


# ---------------------------------------------------------------- dexdata


@pytest.fixture
def dexdata_root(tmp_path):
    root = tmp_path / "testsuite" / "testsuite_mini"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for e in range(2):
        lines = []
        for t in range(8):
            lines.append(json.dumps({
                "images_1": {"type": "image", "url": f"ep{e}_f{t}.png"},
                "state": (rng.randn(7)).tolist(),
                "prompt": "pick the cube",
                "is_robot": True,
            }))
        (root / f"ep{e}.jsonl").write_text("\n".join(lines) + "\n")
        # tiny pngs
        from PIL import Image
        for t in range(8):
            Image.new("RGB", (16, 12), (e * 40, t * 10, 100)).save(root / f"ep{e}_f{t}.png")
    register_dataset(
        {"mini": {"data_path_prefix": str(root), "annotations": str(root), "frequency": 1}},
        prefix="testsuite",
        meta_data={"non_delta_mask": [6], "periodic_mask": None, "periodic_range": None},
    )
    return root


def test_dexdataset_end_to_end(dexdata_root):
    from dexbotic_tpu.data.multimodal import LoadMultiModal

    tok = SimpleTokenizer(model_max_length=256)
    pipeline = T.Pipeline([
        T.ToDict(),
        T.ToNumpy(),
        T.AddAction(predict_length=1),
        T.AddTrajectory(trajectory_length=4, flatten=False, padding_action=True),
        T.ActionNormAnd2String(
            statistic_mapping={"default": {"min": -3, "max": 3}}, add_answer=False),
        LoadMultiModal(),
        T.AddPromptTemplate(),
        T.ReplaceAnswer(),
        T.ToList(),
    ])
    def action_fn(episode, meta_data):
        return pipeline(episode, meta_data=meta_data)
    action_fn.predict_length = 1

    ds = DexDataset(
        dataset_name="testsuite_mini",
        tokenization_func=LLMTokenization(tok, num_image_tokens=3),
        action_process_func=action_fn,
        image_process_func=PreprocessRGB(ImageProcessorConfig(size=16)),
        data_keys=["input_ids", "labels", "action", "image", "state"],
    )
    assert len(ds) == 16
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert item["action"].shape == (4, 7)
    assert (item["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 3
    assert item["state"].shape == (7,)
    # index cache written
    assert (dexdata_root / "index_cache.json").exists()

    # collate a batch
    c = Collator(pad_token_id=tok.pad_token_id, max_length=64)
    batch = c([ds[0], ds[5]])
    assert batch["input_ids"].shape == (2, 64)
    assert batch["images"].shape == (2, 16, 16, 3)


def test_fast_image_native_kernel():
    """Native C++ preprocessing matches PIL resample + normalize — the
    reference's HF image-processor semantics (transformers CLIP/SigLIP
    processors resize via PIL)."""
    from PIL import Image

    from dexbotic_tpu.data.fast_image import (
        available,
        expand2square_fast,
        preprocess_batch_fast,
    )

    if not available():
        pytest.skip("no C++ toolchain")

    rs = np.random.RandomState(0)
    pil_interp = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}
    for h, w, size in ((96, 128, 64), (60, 100, 48), (224, 224, 384)):
        imgs = rs.randint(0, 255, (4, h, w, 3), np.uint8)
        for interp in ("bilinear", "bicubic"):
            out = preprocess_batch_fast(imgs, size, mean=(0.5, 0.5, 0.5),
                                        std=(0.5, 0.5, 0.5), interp=interp)
            assert out.shape == (4, size, size, 3) and out.dtype == np.float32
            ref = np.stack([
                (np.asarray(Image.fromarray(im).resize((size, size),
                                                       pil_interp[interp]))
                 .astype(np.float32) / 255.0 - 0.5) / 0.5
                for im in imgs
            ])
            # <=2 uint8 quanta of slack (PIL's fixed-point coefficients)
            assert np.abs(out - ref).max() < 0.02, (interp, h, w, size)
    imgs = rs.randint(0, 255, (4, 96, 128, 3), np.uint8)

    sq = expand2square_fast(imgs[0], fill=(9, 8, 7))
    assert sq.shape == (128, 128, 3)
    assert sq[0, 0].tolist() == [9, 8, 7]
    np.testing.assert_array_equal(sq[16:112], imgs[0])


def test_fast_image_fused_pad():
    """Fused pad-to-square+preprocess matches expand2square -> per-image path,
    through the preprocess_images_batch dispatch used by the servers."""
    pytest.importorskip("cv2")
    from dexbotic_tpu.data.fast_image import available
    from dexbotic_tpu.data.image_processing import (
        ImageProcessorConfig,
        expand2square,
        preprocess_image,
        preprocess_images_batch,
    )

    if not available():
        pytest.skip("no C++ toolchain")
    rs = np.random.RandomState(1)
    imgs = rs.randint(0, 255, (3, 60, 100, 3), np.uint8)
    cfg = ImageProcessorConfig(size=48, resample="bicubic")
    fill = (10, 20, 30)
    out = preprocess_images_batch(list(imgs), cfg, pad_fill=fill)
    ref = preprocess_images_batch(
        [expand2square(im, fill) for im in imgs], cfg, use_native=False
    )
    assert out.shape == ref.shape == (3, 48, 48, 3)
    assert np.abs(out - ref).max() < 0.05

    # non-pad dispatch: native vs cv2 fallback agree
    out2 = preprocess_images_batch(list(imgs), cfg)
    ref2 = preprocess_images_batch(list(imgs), cfg, use_native=False)
    assert np.abs(out2 - ref2).max() < 0.05

    # mixed shapes fall back cleanly
    mixed = [imgs[0], imgs[1][:50]]
    out3 = preprocess_images_batch(mixed, cfg, pad_fill=fill)
    assert out3.shape == (2, 48, 48, 3)


def test_dm0_tokenization_mask_surface():
    """DM0Tokenization emits the reference's full mask set
    (tokenization/process.py:130-245): token/ar/loss masks + labels derived
    from loss_mask, loss only on assistant content."""
    from dexbotic_tpu.constants import IGNORE_INDEX
    from dexbotic_tpu.tokenization.tokenize import DM0Tokenization, SimpleTokenizer

    tok = SimpleTokenizer(model_max_length=256)
    t = DM0Tokenization(tok, max_len=320)
    out = t([
        {"from": "human", "value": "pick up the cup"},
        {"from": "gpt", "value": "1 2 3"},
    ])
    assert set(out) == {"input_ids", "labels", "token_mask", "ar_mask", "loss_mask"}
    assert out["input_ids"].shape == (320,)
    n_real = int(out["token_mask"].sum())
    assert 0 < n_real < 320
    # ar causal bits: 1 on real tokens, 0 on padding
    np.testing.assert_array_equal(out["ar_mask"][:n_real], 1)
    np.testing.assert_array_equal(out["ar_mask"][n_real:], 0)
    # loss only on assistant content; labels = ids there, IGNORE elsewhere
    lm = out["loss_mask"]
    assert 0 < lm.sum() < n_real
    np.testing.assert_array_equal(out["labels"][lm], out["input_ids"][lm])
    assert (out["labels"][~lm] == IGNORE_INDEX).all()
    # the human turn carries no loss: first loss index comes after the
    # system+human spans (ASSISTANT role appears before any loss token)
    first_loss = int(np.argmax(lm))
    assert first_loss > 4

    # empty trailing assistant turn is dropped -> zero loss tokens
    out2 = t([
        {"from": "human", "value": "pick up the cup"},
        {"from": "gpt", "value": ""},
    ])
    assert out2["loss_mask"].sum() == 0


def test_pixel_aug_policies_parameter_faithful():
    """Aug policies mirror the reference stacks (augmentations.py:135-233):
    output geometry per policy, uint8 dtype, seeded determinism."""
    from dexbotic_tpu.data.image_processing import PixelAug, _pad_to_square

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (48, 64, 3)).astype(np.uint8)

    expect_shape = {
        "v1": (48, 64, 3), "v2": (48, 64, 3), "v3": (48, 64, 3),
        "pi0": (224, 224, 3), "dm0": (728, 728, 3),
        "color": (64, 64, 3), "color_dm0": (728, 728, 3),
        "identity": (48, 64, 3),
    }
    for pol, shape in expect_shape.items():
        out = PixelAug(pol, seed=1)(img)
        assert out.shape == shape and out.dtype == np.uint8, pol
        out2 = PixelAug(pol, seed=1)(img)
        np.testing.assert_array_equal(out, out2)  # seeded determinism

    # v1 = CoarseDropout only: 3-6 holes of 5-20% -> most pixels untouched
    out = PixelAug("v1", seed=3, p=1.0)(img)
    frac_changed = float((out != img).any(-1).mean())
    assert 0.0 < frac_changed < 0.5

    # PadToSquare centers with constant fill
    padded = _pad_to_square(img, fill=0)
    assert padded.shape == (64, 64, 3)
    assert (padded[:8] == 0).all() and (padded[-8:] == 0).all()
    np.testing.assert_array_equal(padded[8:56], img)


def test_fast_image_bgr_channel_order():
    """channel_order='bgr' folds cv2's BGR output into the kernel: identical
    result to preprocessing the RGB frame (serving decode path)."""
    from dexbotic_tpu.data.fast_image import available
    from dexbotic_tpu.data.image_processing import (
        ImageProcessorConfig,
        preprocess_images_batch,
    )

    rs = np.random.RandomState(2)
    rgb = rs.randint(0, 255, (2, 60, 80, 3), np.uint8)
    bgr = rgb[:, :, :, ::-1]
    cfg = ImageProcessorConfig(size=32, resample="bicubic")
    ref = preprocess_images_batch(list(rgb), cfg, pad_fill=(1, 2, 3))
    got = preprocess_images_batch(list(bgr), cfg, pad_fill=(1, 2, 3),
                                  channel_order="bgr")
    tol = 1e-6 if available() else 0.05
    assert np.abs(got - ref).max() <= tol
    # non-pad path + fallback equivalence
    got2 = preprocess_images_batch(list(bgr), cfg, channel_order="bgr")
    ref2 = preprocess_images_batch(list(rgb), cfg, use_native=False)
    assert np.abs(got2 - ref2).max() < 0.05


# ---------------------------------------------------------------- pluggable IO


def test_smart_io_mem_driver_roundtrip():
    """data/io.py: the megfile seam — mem:// fake-remote store supports
    open/glob/exists/local_path with the same API local paths use."""
    from dexbotic_tpu.data import io as dio

    mem = dio._DRIVERS["mem"]
    mem.clear()
    with dio.smart_open("mem://ds/a/e1.jsonl", "w") as f:
        f.write('{"x": 1}\n')
    with dio.smart_open("mem://ds/b/e2.jsonl", "w") as f:
        f.write('{"x": 2}\n')
    assert dio.smart_exists("mem://ds/a/e1.jsonl")
    assert not dio.smart_exists("mem://ds/a/nope.jsonl")
    assert dio.smart_glob("mem://ds/**/*.jsonl") == [
        "mem://ds/a/e1.jsonl", "mem://ds/b/e2.jsonl",
    ]
    with dio.smart_open("mem://ds/a/e1.jsonl") as f:
        assert json.loads(f.read())["x"] == 1
    # binary + local_path (the video-decoder fetch path)
    with dio.smart_open("mem://ds/frame.bin", "wb") as f:
        f.write(b"\x00\x01\x02")
    local = dio.smart_local_path("mem://ds/frame.bin")
    assert open(local, "rb").read() == b"\x00\x01\x02"
    # unknown scheme is a hard error, not a silent local fallback
    with pytest.raises(ValueError):
        dio.smart_open("s3://bucket/x")
    mem.clear()


def test_dexdataset_reads_fake_remote(dexdata_root):
    """DexDataset end-to-end over a mem:// dataset: index build, jsonl reads,
    and image loads all go through the pluggable driver — local behavior
    unchanged (the other dexdata tests), remote plug-in needs no code."""
    import io as pyio

    from PIL import Image

    from dexbotic_tpu.data import io as dio
    from dexbotic_tpu.data.multimodal import LoadMultiModal

    mem = dio._DRIVERS["mem"]
    mem.clear()
    # mirror the local fixture into the fake remote
    base = "mem://remote/testsuite_mini"
    for p in sorted(dexdata_root.iterdir()):
        if p.suffix == ".jsonl":
            with dio.smart_open(f"{base}/{p.name}", "w") as f:
                f.write(p.read_text())
        elif p.suffix == ".png":
            buf = pyio.BytesIO()
            Image.open(p).save(buf, format="PNG")
            with dio.smart_open(f"{base}/{p.name}", "wb") as f:
                f.write(buf.getvalue())
    register_dataset(
        {"mini_remote": {"data_path_prefix": base, "annotations": base,
                         "frequency": 1}},
        prefix="testsuite",
        meta_data={"non_delta_mask": [6], "periodic_mask": None,
                   "periodic_range": None},
    )

    tok = SimpleTokenizer(model_max_length=256)
    pipeline = T.Pipeline([
        T.ToDict(),
        T.ToNumpy(),
        T.AddAction(predict_length=1),
        T.AddTrajectory(trajectory_length=4, flatten=False, padding_action=True),
        T.ActionNormAnd2String(
            statistic_mapping={"default": {"min": -3, "max": 3}}, add_answer=False),
        LoadMultiModal(),
        T.AddPromptTemplate(),
        T.ReplaceAnswer(),
        T.ToList(),
    ])

    def action_fn(episode, meta_data):
        return pipeline(episode, meta_data=meta_data)

    action_fn.predict_length = 1

    ds = DexDataset(
        dataset_name="testsuite_mini_remote",
        tokenization_func=LLMTokenization(tok, num_image_tokens=3),
        action_process_func=action_fn,
        image_process_func=PreprocessRGB(ImageProcessorConfig(size=16)),
        data_keys=["input_ids", "labels", "action", "image", "state"],
    )
    assert len(ds) == 16
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert item["action"].shape == (4, 7)
    mem.clear()
