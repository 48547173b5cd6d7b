"""Dynamic request micro-batching (exp/serve.py).

Concurrent single-frame /process_frame requests arriving within the window
are coalesced into ONE padded device call; every client still gets its own
action chunk.  TPU-native serving extension (the reference serves strictly
sequentially, Flask threaded=False at base_exp.py:652-653).
"""

import concurrent.futures
import io
import json
import urllib.request

import jax
import numpy as np
from PIL import Image

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
from dexbotic_tpu.exp.serve import CogActServer


def _make_server(micro_batch):
    exp = CogActExp(
        model=CogActModelConfig(
            llm_preset="test", vit_preset="test", action_model_type="DiT-S",
            action_dim=7, chunk_size=4,
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=96),
        data=base_exp.DataConfig(image_processor="28", aug_policy="identity"),
    )
    cfg, params, norms = exp.load_for_inference()
    tokenizer = exp.tokenizer.build_tokenizer()
    return CogActServer(
        exp, cfg, params, tokenizer, norms, host="127.0.0.1", port=0,
        micro_batch=micro_batch, micro_batch_window_ms=200.0,
    )


def _post(port, prompt, color):
    buf = io.BytesIO()
    Image.new("RGB", (64, 48), color).save(buf, "PNG")
    boundary = "XBX"
    parts = [
        (f"--{boundary}\r\nContent-Disposition: form-data; name=\"text\"\r\n\r\n"
         f"{prompt}\r\n").encode(),
        (f"--{boundary}\r\nContent-Disposition: form-data; name=\"im\"; "
         f"filename=\"f.png\"\r\nContent-Type: image/png\r\n\r\n").encode()
        + buf.getvalue() + b"\r\n",
    ]
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/process_frame", data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return np.asarray(json.loads(r.read()))


def test_concurrent_singles_coalesce_into_one_device_call():
    server = _make_server(micro_batch=4)
    httpd = server.serve_background()
    port = httpd.server_address[1]
    try:
        # warm the compile with one request so the concurrent burst lands
        # inside one window instead of queueing behind a first-compile
        a0 = _post(port, "warm up", (1, 2, 3))
        assert a0.shape == (4, 7)

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            futs = [
                ex.submit(_post, port, f"task {i}", (40 * i, 90, 10))
                for i in range(4)
            ]
            outs = [f.result() for f in futs]
        for a in outs:
            assert a.shape == (4, 7)
            assert np.isfinite(a).all()
        assert server.batched_calls >= 1, "no request coalescing happened"
    finally:
        httpd.shutdown()


def test_micro_batch_off_still_serves():
    server = _make_server(micro_batch=0)
    assert server._mb_queue is None
    httpd = server.serve_background()
    port = httpd.server_address[1]
    try:
        a = _post(port, "plain path", (9, 9, 9))
        assert a.shape == (4, 7) and np.isfinite(a).all()
        assert server.batched_calls == 0
    finally:
        httpd.shutdown()


def test_flow_server_micro_batch_coalesces():
    """FlowVLAServer path: per-request prompts + states coalesce correctly."""
    import dataclasses

    from dexbotic_tpu.exp.pi0_exp import FlowModelConfig, Pi0Exp
    from dexbotic_tpu.exp.serve import FlowVLAServer

    exp = Pi0Exp(
        model=FlowModelConfig(
            llm_preset="test", expert_preset="test", vit_preset="test",
            action_dim=8, chunk_size=5,
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=48),
    )
    exp.data = dataclasses.replace(
        exp.data, num_images=2, image_processor="28", aug_policy="identity"
    )
    cfg, params, norms = exp.load_for_inference()
    tokenizer = exp.tokenizer.build_tokenizer()
    server = FlowVLAServer(
        exp, cfg, params, tokenizer, norms, host="127.0.0.1", port=0,
        micro_batch=3, micro_batch_window_ms=200.0,
    )
    httpd = server.serve_background()
    port = httpd.server_address[1]
    try:
        a0 = _post(port, "warm up", (5, 5, 5))
        assert a0.shape == (5, 7)  # inference_cfg.action_dim_out trims padding dims
        with concurrent.futures.ThreadPoolExecutor(max_workers=3) as ex:
            futs = [
                ex.submit(_post, port, f"go to {i}", (30 * i, 60, 20))
                for i in range(3)
            ]
            outs = [f.result() for f in futs]
        for a in outs:
            assert a.shape == (5, 7) and np.isfinite(a).all()
        assert server.batched_calls >= 1

        # explicit batch_size request bypasses the coalescer (refactored
        # get_response path): 2 rows x 1 view, semicolon states
        boundary = "XBX"
        parts = [
            (f"--{boundary}\r\nContent-Disposition: form-data; name=\"text\""
             "\r\n\r\ngo to the door\r\n").encode(),
            (f"--{boundary}\r\nContent-Disposition: form-data; "
             "name=\"batch_size\"\r\n\r\n2\r\n").encode(),
            (f"--{boundary}\r\nContent-Disposition: form-data; name=\"states\""
             "\r\n\r\n0.1,0.2;0.3,0.4\r\n").encode(),
        ]
        for i in range(2):
            buf = io.BytesIO()
            Image.new("RGB", (64, 48), (i * 50, 10, 10)).save(buf, "PNG")
            parts.append(
                (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f"name=\"im{i}\"; filename=\"f{i}.png\"\r\n"
                 "Content-Type: image/png\r\n\r\n").encode()
                + buf.getvalue() + b"\r\n"
            )
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/process_frame", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            batched = np.asarray(json.loads(r.read()))
        assert batched.shape == (2, 5, 7) and np.isfinite(batched).all()
    finally:
        httpd.shutdown()


def test_fused_on_device_preprocess_matches_host_path():
    """CogActServer(fuse_preprocess=True): raw uint8 upload + on-device
    pad/resize/normalize produces the same actions as the host C++ kernel
    path (both mirror PIL's clip8 two-pass, so pixel inputs agree to float
    noise)."""
    from PIL import Image as PILImage

    exp = CogActExp(
        model=CogActModelConfig(
            llm_preset="test", vit_preset="test", action_model_type="DiT-S",
            action_dim=7, chunk_size=4,
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=96),
        data=base_exp.DataConfig(image_processor="28", aug_policy="identity"),
    )
    cfg, params, norms = exp.load_for_inference()
    tokenizer = exp.tokenizer.build_tokenizer()
    host_srv = CogActServer(exp, cfg, params, tokenizer, norms,
                            host="127.0.0.1", port=0)
    dev_srv = CogActServer(exp, cfg, params, tokenizer, norms,
                           host="127.0.0.1", port=0, fuse_preprocess=True)

    buf = io.BytesIO()
    rs = np.random.RandomState(3)
    PILImage.fromarray(
        rs.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    ).save(buf, "PNG")
    frames = [("image", buf.getvalue())]
    fields = {"text": "pick up the cube"}
    # pin both servers' rng streams
    host_srv.rng = jax.random.PRNGKey(11)
    dev_srv.rng = jax.random.PRNGKey(11)
    a_host = np.asarray(host_srv.get_response(fields, frames))
    a_dev = np.asarray(dev_srv.get_response(fields, frames))
    assert a_dev.shape == a_host.shape
    np.testing.assert_allclose(a_dev, a_host, atol=2e-2)
    # the fused program is cached per camera geometry
    assert len(dev_srv._raw_infer) == 1


def test_discrete_vla_server_engine_and_fallback():
    """DiscreteVLAServer: greedy decode through the continuous-batching
    engine returns the parsed action when the text parses, and both modes
    agree on the generated text when it does not parse (fallback path)."""
    import dataclasses as dc

    from dexbotic_tpu.exp.discrete_vla_exp import (
        DiscreteVLAExp, DiscreteVLAModelConfig,
    )
    from dexbotic_tpu.exp.serve import DiscreteVLAServer
    from dexbotic_tpu.models.discrete_vla import init_discrete_vla

    exp = DiscreteVLAExp(
        model=DiscreteVLAModelConfig(llm_preset="test", vit_preset="test"),
        tokenizer=base_exp.TokenizerConfig(model_max_length=96),
        data=base_exp.DataConfig(image_processor="28", aug_policy="identity"),
    )
    cfg = dc.replace(
        exp.model.build_config(), max_new_tokens=8, max_retries=1,
    )
    params = init_discrete_vla(jax.random.PRNGKey(0), cfg)
    tokenizer = exp.tokenizer.build_tokenizer()

    plain = DiscreteVLAServer(exp, cfg, params, tokenizer, host="127.0.0.1", port=0)
    cb = DiscreteVLAServer(exp, cfg, params, tokenizer, host="127.0.0.1",
                           port=0, continuous_batching=2)
    assert cb.concurrent and cb.engine is not None
    try:
        buf = io.BytesIO()
        Image.new("RGB", (28, 28), (40, 90, 160)).save(buf, "PNG")
        frames = [("image", buf.getvalue())]
        fields = {"text": "pick up the cube"}
        r_plain = plain.get_response(fields, frames)
        r_cb = cb.get_response(fields, frames)
        assert len(r_plain["actions"]) == cfg.action_dim
        assert len(r_cb["actions"]) == cfg.action_dim
        # both paths run the same greedy model: when the engine path's text
        # parses, the actions must agree; otherwise both fell back
        if r_cb["text"]:
            np.testing.assert_allclose(r_cb["actions"], r_plain["actions"],
                                       atol=1e-6)
    finally:
        cb.engine.close()
