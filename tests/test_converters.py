"""Data converters: RLDS/LeRobot -> Dexdata (episode-level logic, no TFDS or
pyarrow needed — those are gated CLI deps; the per-episode functions are
driven with synthetic inputs)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "script", "convert_data")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _steps(n=5, h=24, w=32):
    rs = np.random.RandomState(0)
    steps = []
    for t in range(n):
        steps.append({
            "observation": {
                "image": rs.randint(0, 255, (h, w, 3), np.uint8),
                "wrist_image": rs.randint(0, 255, (h, w, 3), np.uint8),
            },
            "action": np.r_[0.1 * (t + 1) * np.ones(3), 0.01 * np.ones(3), [1.0]],
        })
    return steps


def test_rlds_convert_episode_png(tmp_path):
    rlds = _load("convert_rlds_to_dexdata")
    lines = rlds.convert_episode(
        _steps(), 0, "mini_suite", "wipe the table",
        image_keys={"primary": "image", "secondary": None, "wrist": "wrist_image"},
        depth_keys={"primary": None},
        video_dir=str(tmp_path), frames="png", fps=10,
    )
    assert len(lines) == 5
    e0, e2 = lines[0], lines[2]
    assert e0["prompt"] == "wipe the table" and e0["is_robot"] is True
    # two camera streams -> images_1/images_2 with per-frame png refs
    assert set(k for k in e0 if k.startswith("images_")) == {"images_1", "images_2"}
    assert e0["images_1"]["type"] == "image"
    assert os.path.exists(tmp_path / e0["images_1"]["url"])
    # state synthesis: pos/ori accumulate the PRIOR actions; gripper = current
    assert e0["state"] == [0, 0, 0, 0, 0, 0, 1.0]
    np.testing.assert_allclose(e2["state"][:3], [0.1 + 0.2] * 3, atol=1e-9)
    np.testing.assert_allclose(e2["state"][3:6], [0.02] * 3, atol=1e-9)
    assert e2["state"][6] == 1.0


def test_rlds_convert_episode_video_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rlds = _load("convert_rlds_to_dexdata")
    lines = rlds.convert_episode(
        _steps(), 3, "mini_suite", "p",
        image_keys={"primary": "image"}, depth_keys={},
        video_dir=str(tmp_path), frames="video", fps=10,
    )
    url = lines[0]["images_1"]["url"]
    assert url.endswith("episode3_primary.mp4")
    assert lines[4]["images_1"]["frame_idx"] == 4
    cap = cv2.VideoCapture(str(tmp_path / url))
    if not cap.isOpened():  # container codec unavailable in this image
        pytest.skip("no mp4 codec")
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 5


def test_rlds_decode_frame_encoded_bytes():
    cv2 = pytest.importorskip("cv2")
    rlds = _load("convert_rlds_to_dexdata")
    img = np.random.RandomState(1).randint(0, 255, (16, 16, 3), np.uint8)
    ok, buf = cv2.imencode(".png", img[..., ::-1])
    assert ok
    out = rlds.decode_frame(np.asarray(bytes(buf.tobytes()), dtype=object))
    np.testing.assert_array_equal(out, img)
    assert rlds.decode_frame(None) is None
    np.testing.assert_array_equal(rlds.decode_frame(img), img)


def test_lerobot_parse_episode_and_tasks(tmp_path):
    import pandas as pd

    lr = _load("convert_lerobot_to_dexdata")

    # task table validation
    meta = tmp_path / "meta"
    meta.mkdir()
    with open(meta / "tasks.jsonl", "w") as f:
        f.write(json.dumps({"task_index": 0, "task": "coarse task"}) + "\n")
        f.write(json.dumps({"task_index": 1, "task": "zh@pick the cup"}) + "\n")
    tasks = lr.load_task_list(str(tmp_path))
    assert tasks == ["coarse task", "zh@pick the cup"]

    df = pd.DataFrame({
        "observation.state": [np.arange(4, dtype=np.float64) + t for t in range(3)],
        "action": [np.ones(2) * t for t in range(3)],
        "frame_index": [0, 1, 2],
        "task_index": [1, 1, 1],
        "coarse_task_index": [0, 0, 0],
        "timestamp": [0.0, 0.1, 0.2],
        "episode_index": [7, 7, 7],
        "index": [70, 71, 72],
        "quality_index": [1, 1, 1],
    })
    lines = lr.parse_episode(
        df, ["observation.state"], ["action"], ["observation.images.top"],
        ["videos/chunk-000/observation.images.top/episode_000007.mp4"],
        tasks, subtask_schema=True,
    )
    assert lines is not None and len(lines) == 3
    e1 = json.loads(lines[1])
    assert e1["prompt"] == "coarse task"  # coarse index drives the prompt
    assert e1["extra"]["subtask"] == "pick the cup"
    assert e1["extra"]["episode_index"] == 7 and e1["extra"]["quality_index"] == 1
    assert e1["images_1"] == {
        "type": "video",
        "url": "videos/chunk-000/observation.images.top/episode_000007.mp4",
        "frame_idx": 1,
    }
    assert e1["state"] == [1.0, 2.0, 3.0, 4.0] and e1["action"] == [1.0, 1.0]

    # invalid subtask format poisons the episode (reference contract)
    bad = lr.parse_episode(
        df, ["observation.state"], [], ["k"], ["v.mp4"],
        ["coarse task", "no-at-sign"], subtask_schema=True,
    )
    assert bad is None


def _load_hw(name):
    hw = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "hardware", "so101")
    spec = importlib.util.spec_from_file_location(name, os.path.join(hw, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_so101_converter_end_to_end(tmp_path):
    """Full SO-101 LeRobot tree -> Dexdata: prompt extraction with fallbacks,
    camera discovery, stable episode numbering, video copy."""
    pq = pytest.importorskip("pyarrow.parquet")
    import pandas as pd
    import pyarrow as pa

    root = tmp_path / "rec"
    task = root / "press_button" / "train"
    (task / "meta").mkdir(parents=True)
    (task / "data" / "chunk-000").mkdir(parents=True)
    cam = task / "videos" / "observation.images.front"
    (cam / "chunk-000").mkdir(parents=True)

    with open(task / "meta" / "tasks.jsonl", "w") as f:
        f.write(json.dumps({"task_index": 0, "task": "zh@press the button"}) + "\n")

    for ep in range(2):
        df = pd.DataFrame({
            "observation.state": [np.arange(6, dtype=np.float64) + t for t in range(3)],
            "action": [np.ones(6) * t for t in range(3)],
            "frame_index": [0, 1, 2],
            "task_index": [0, 0, 0],
            "timestamp": [0.0, 0.1, 0.2],
            "episode_index": [ep] * 3,
        })
        pq.write_table(pa.Table.from_pandas(df),
                       task / "data" / "chunk-000" / f"episode_{ep:06d}.parquet")
        (cam / "chunk-000" / f"episode_{ep:06d}.mp4").write_bytes(b"fakevideo")

    conv = _load_hw("convert_so101_to_dexdata")
    out = tmp_path / "out"
    n = conv.convert(str(root), str(out))
    assert n == 2
    ep0 = [json.loads(l) for l in
           open(out / "jsonl" / "press_button" / "episode_00000.jsonl")]
    assert len(ep0) == 3
    assert ep0[0]["prompt"] == "zh@press the button"
    assert ep0[0]["extra"]["subtask"] == "press the button"
    assert ep0[1]["images_1"]["frame_idx"] == 1
    assert ep0[0]["images_1"]["url"] == "press_button/episode_00000_front.mp4"
    assert (out / "videos" / "press_button" / "episode_00001_front.mp4").exists()

    # prompt fallback: numeric tasks -> directory name
    assert conv.get_task_list(str(tmp_path / "nonexistent")) == []


def test_so101_client_delta_chain(monkeypatch):
    """Chained delta integration off the last queued action, gripper zeroed,
    rpy wrap, and hold_ticks duplication (reference client.py:24-66)."""
    client_mod = _load_hw("client")

    chunk = [[0.1, 0, 0, 3.0, 0, 0, 1.0], [0.1, 0, 0, 0.5, 0, 0, 0.0]]

    class FakeResp:
        def raise_for_status(self):
            pass

        def json(self):
            return {"response": chunk}

    import types

    fake_requests = types.SimpleNamespace(post=lambda *a, **k: FakeResp())
    monkeypatch.setitem(sys.modules, "requests", fake_requests)

    c = client_mod.SO101Client("http://x", use_delta=True, hold_ticks=2)
    obs = {"image": np.zeros((8, 8, 3), np.uint8)}
    a1 = c.act(obs, "p")
    a2 = c.act(obs, "p")
    np.testing.assert_allclose(a1, a2)  # held for two ticks
    np.testing.assert_allclose(a1[:4], [0.1, 0, 0, 3.0])
    assert a1[6] == 1.0
    a3 = c.act(obs, "p")
    # second delta integrates on the first ABSOLUTE action; 3.0+0.5 wraps
    np.testing.assert_allclose(a3[0], 0.2)
    np.testing.assert_allclose(a3[3], 3.5 - 2 * np.pi)
    assert a3[6] == 0.0  # gripper not integrated (zeroed base)
    assert len(c.action_queue) == 1
