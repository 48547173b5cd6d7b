"""Hybrid CogACT co-training end-to-end: mixed robot + text (VQA-style)
batches through HybridCogActExp's real data pipeline, gating flags, and a
sharded train step (weak r4 #5; gating math itself is pinned vs the
reference torch backward in test_train_parity.py::
test_hybrid_cogact_training_parity).

Reference: exp/hybrid_cogact_exp.py + transform/common.py:117-141
(AddActionFlag/AddTextFlag) + hybrid_cogact_arch.py:126-198.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dexbotic_tpu.data.registry import register_dataset


@pytest.fixture(scope="module")
def hybrid_suite(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data") / "hyb" / "hyb_all")
    os.makedirs(root)
    rng = np.random.RandomState(3)
    # robot episodes: states -> actions, answer replaced with the default
    # (ReplaceAnswer -> has_text = 0)
    for e in range(2):
        lines = []
        for t in range(8):
            Image.new("RGB", (64, 48), (e * 40, t * 20, 90)).save(
                f"{root}/r{e}f{t}.png")
            lines.append(json.dumps({
                "images_1": {"type": "image", "url": f"r{e}f{t}.png"},
                "state": (np.sin(np.arange(7) + t * 0.4)
                          + 0.01 * rng.randn(7)).tolist(),
                "prompt": "stack the bowls",
                "is_robot": True,
            }))
        open(f"{root}/r{e}.jsonl", "w").write("\n".join(lines))
    # text episodes: prompt+answer, NO state -> AddActionFlag gives
    # has_action = 0 and a zero action placeholder
    troot = str(tmp_path_factory.mktemp("data2") / "vqa" / "general_vqa")
    os.makedirs(troot)
    for e in range(2):
        lines = []
        for t in range(8):
            Image.new("RGB", (64, 48), (200, e * 50, t * 25)).save(
                f"{troot}/t{e}f{t}.png")
            lines.append(json.dumps({
                "images_1": {"type": "image", "url": f"t{e}f{t}.png"},
                "prompt": "what color is the bowl?",
                "answer": "red",
            }))
        open(f"{troot}/t{e}.jsonl", "w").write("\n".join(lines))
    meta = {"non_delta_mask": [6], "periodic_mask": None,
            "periodic_range": None}
    register_dataset(
        {"all": {"data_path_prefix": root, "annotations": root, "frequency": 1}},
        prefix="hyb", meta_data=meta,
    )
    # text/VQA sets follow the reference's 'general*' naming convention —
    # compute_norm_stats skips them (base_exp.py: name.startswith('general'))
    register_dataset(
        {"vqa": {"data_path_prefix": troot, "annotations": troot,
                 "frequency": 1}},
        prefix="general", meta_data=meta,
    )
    return root


@pytest.mark.heavy
def test_hybrid_exp_mixed_batch_train(tmp_path, hybrid_suite, monkeypatch):
    from dexbotic_tpu.exp import base_exp
    from dexbotic_tpu.exp.cogact_exp import CogActModelConfig
    from dexbotic_tpu.exp.hybrid_cogact_exp import HybridActionConfig, HybridCogActExp
    from dexbotic_tpu.exp.optim import OptimizerConfig
    from dexbotic_tpu.exp.trainer import TrainerConfig

    monkeypatch.chdir(tmp_path)
    exp = HybridCogActExp(
        model=CogActModelConfig(
            llm_preset="test", vit_preset="test", action_model_type="DiT-S",
            action_dim=7, chunk_size=4,
        ),
        action=HybridActionConfig(
            trajectory_length=4, delta=False, padding_action=True,
            empty_action_dim=28,  # chunk 4 x dim 7
        ),
        data=base_exp.DataConfig(
            dataset_name="hyb_all+general_vqa", image_processor="28", aug_policy="identity",
            data_keys=["input_ids", "labels", "action", "image",
                       "has_action", "has_text"],
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=96),
        trainer=TrainerConfig(
            output_dir=str(tmp_path / "out"), max_steps=3,
            per_device_batch_size=1, logging_steps=1, save_steps=3,
            bf16=False, resume=False,
        ),
        optimizer=OptimizerConfig(learning_rate=1e-4),
    )

    # the dataset itself must carry BOTH flag kinds
    exp._auto_compute_norm_stats()  # train() does this first; probe needs it
    tokenizer = exp.tokenizer.build_tokenizer()
    action_fn = exp.action.build_action_process_func()
    ds = exp.data.build_data(exp.build_tokenization(tokenizer), action_fn)
    flags = [(bool(np.any(ds[i]["has_action"])), bool(np.any(ds[i]["has_text"])))
             for i in range(len(ds))]
    kinds = set(flags)
    assert (True, False) in kinds, "no robot (action-only) items"
    assert (False, True) in kinds, "no text (VQA) items"

    log = exp.train()
    assert log["step"] == 3
    assert np.isfinite(log["loss"])
    assert "text_loss" in log and np.isfinite(log["text_loss"])
    assert "action_loss" in log and np.isfinite(log["action_loss"])
