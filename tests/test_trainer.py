import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.exp.optim import OptimizerConfig, build_optimizer, param_group_labels
from dexbotic_tpu.exp.trainer import Trainer, TrainerConfig, load_checkpoint_params
from dexbotic_tpu.models.cogact import CogActConfig, cogact_loss, init_cogact
from dexbotic_tpu.models.vlm import VLMConfig
from dexbotic_tpu.nn.transformer import TransformerConfig
from dexbotic_tpu.nn.vit import ViTConfig
from dexbotic_tpu.parallel.mesh import fsdp_param_specs, make_mesh

LLM = TransformerConfig(
    vocab_size=64, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=8, intermediate_size=64, attn_impl="xla",
)
VIT = ViTConfig(
    image_size=28, patch_size=14, hidden_size=24, num_layers=2, num_heads=4,
    intermediate_size=48, select_layer=None,
)
COG = CogActConfig(vlm=VLMConfig(llm=LLM, vit=VIT), action_model_type="DiT-S",
                   action_dim=7, chunk_size=4)


def test_mesh_and_fsdp_specs():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    params = {"big": jnp.zeros((16, 1024, 32)), "small": jnp.zeros((4,))}
    specs = fsdp_param_specs(params, mesh, min_size=128)
    assert specs["big"] == jax.sharding.PartitionSpec(None, "data", None)
    assert specs["small"] == jax.sharding.PartitionSpec()


def test_param_group_labels():
    p = init_cogact(jax.random.PRNGKey(0), COG)
    labels = param_group_labels(p)
    assert labels["action_head"]["final"]["w"] == "action_head"
    assert labels["vlm"]["projector"]["fc0"]["w"] == "mm_projector"
    assert labels["vlm"]["vit"]["pos_embed"] == "mm_vision"
    assert labels["vlm"]["llm"]["norm"]["w"] == "base"


def test_frozen_group_lr_zero():
    p = {"vit": {"w": jnp.ones((4, 4))}, "llm": {"w": jnp.ones((4, 4))}}
    tx = build_optimizer(OptimizerConfig(mm_vision_lr=0.0, learning_rate=0.1), p, 10)
    state = tx.init(p)
    grads = jax.tree.map(jnp.ones_like, p)
    # step 0 is inside warmup (lr=0); check the second step
    updates, state = tx.update(grads, state, p)
    updates, _ = tx.update(grads, state, p)
    assert float(jnp.abs(updates["vit"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["llm"]["w"]).sum()) > 0.0


def _batch(B=8):
    nt = COG.vlm.num_image_tokens
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 60, (B, nt + 6))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    return {
        "input_ids": ids,
        "attention_mask": np.ones_like(ids, dtype=bool),
        "images": rs.randn(B, 1, 28, 28, 3).astype(np.float32),
        "actions": np.tanh(rs.randn(B, 4, 7)).astype(np.float32),
    }


def _loss_fn(params, batch, rng):
    return cogact_loss(params, COG, batch, rng)


def test_trainer_loss_decreases_and_checkpoints(tmp_path):
    params = init_cogact(jax.random.PRNGKey(0), COG)
    tcfg = TrainerConfig(
        output_dir=str(tmp_path), max_steps=12, per_device_batch_size=1,
        logging_steps=4, save_steps=6, bf16=False, resume=False,
    )
    trainer = Trainer(_loss_fn, params, tcfg, OptimizerConfig(learning_rate=1e-3))

    batches = [_batch() for _ in range(12)]
    trainer.train(iter(batches))
    assert trainer.step == 12
    ckpt = trainer.latest_checkpoint()
    assert ckpt and ckpt.endswith("checkpoint-12")
    restored = load_checkpoint_params(ckpt)
    assert "action_head" in restored

    # resume path
    trainer2 = Trainer(
        _loss_fn, init_cogact(jax.random.PRNGKey(1), COG),
        TrainerConfig(**{**tcfg.__dict__, "resume": True, "max_steps": 12}),
        OptimizerConfig(learning_rate=1e-3),
    )
    assert trainer2.maybe_resume()
    assert trainer2.step == 12
    # optimizer moments round-trip bit-exactly (not re-initialized to zeros)
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.opt_state),
        jax.tree_util.tree_leaves(trainer2.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_freeze_flags_exclude_moments_and_updates():
    """freeze_* flags: no updates AND no optimizer moments for frozen
    subtrees (VERDICT r1 item 7; reference base_exp.py:268-331)."""
    p = init_cogact(jax.random.PRNGKey(0), COG)
    cfg = OptimizerConfig(learning_rate=0.1, freeze_llm=True, freeze_mm_vision=True)
    tx = build_optimizer(cfg, p, 10)
    state = tx.init(p)
    # moment state holds leaves only for trainable params: count them
    n_params = len(jax.tree_util.tree_leaves(p))
    n_llm_vit = len(jax.tree_util.tree_leaves(p["vlm"]["llm"])) + len(
        jax.tree_util.tree_leaves(p["vlm"]["vit"])
    )
    n_lm_head = len(jax.tree_util.tree_leaves(p["vlm"]["llm"].get("lm_head", {})))
    n_state = len(jax.tree_util.tree_leaves(state))
    # adam keeps 2 moments (mu, nu) per trainable leaf (+ scalar counts)
    n_trainable = n_params - n_llm_vit + n_lm_head
    assert n_state < 2 * n_params  # frozen leaves excluded
    assert n_state >= 2 * n_trainable

    grads = jax.tree.map(jnp.ones_like, p)
    updates, state = tx.update(grads, state, p)
    updates, _ = tx.update(grads, state, p)
    assert float(jnp.abs(updates["vlm"]["llm"]["layers"]["ln1"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["vlm"]["vit"]["pos_embed"]).sum()) == 0.0
    assert float(jnp.abs(updates["action_head"]["x_embed"]["w"]).sum()) > 0.0
    # lm_head stays trainable under freeze_llm (reference freezes backbone only)
    if "lm_head" in p["vlm"]["llm"]:
        assert float(jnp.abs(updates["vlm"]["llm"]["lm_head"]["w"]).sum()) > 0.0


def test_adapter_only_checkpoint_roundtrip(tmp_path):
    """adapter_save writes only the projector subtree; resume and serve-load
    merge it into base params (reference mm_projector.bin mode)."""
    from dexbotic_tpu.exp.trainer import apply_adapter, extract_adapter

    params = init_cogact(jax.random.PRNGKey(0), COG)
    tcfg = TrainerConfig(
        output_dir=str(tmp_path), max_steps=4, per_device_batch_size=1,
        save_steps=4, bf16=False, resume=False, adapter_save=True,
        save_optimizer=False,
    )
    trainer = Trainer(
        _loss_fn, params, tcfg,
        OptimizerConfig(learning_rate=1e-3, freeze_llm=True, freeze_mm_vision=True),
        norm_stats_json='{"norm_stats": {}}',
    )
    trainer.train(iter([_batch() for _ in range(4)]))
    ckpt = trainer.latest_checkpoint()
    import os

    assert os.path.isdir(os.path.join(ckpt, "adapter"))
    assert not os.path.isdir(os.path.join(ckpt, "params"))  # adapter only
    assert os.path.exists(os.path.join(ckpt, "norm_stats.json"))

    # serve-load: merge adapter into an independent base tree
    base = init_cogact(jax.random.PRNGKey(0), COG)
    merged = load_checkpoint_params(ckpt, base_params=base)
    # projector weights come from training, the rest from base
    np.testing.assert_array_equal(
        np.asarray(merged["vlm"]["vit"]["pos_embed"]),
        np.asarray(base["vlm"]["vit"]["pos_embed"]),
    )
    trained_proj = extract_adapter(jax.tree.map(np.asarray, trainer.params))
    merged_proj = extract_adapter(merged)
    for k in trained_proj:
        np.testing.assert_allclose(merged_proj[k], trained_proj[k], rtol=1e-6)
    # and the projector actually moved vs base
    base_proj = extract_adapter(base)
    assert any(
        np.abs(base_proj[k] - merged_proj[k]).max() > 0 for k in base_proj
    )

    # resume path: a fresh trainer picks the adapter up
    trainer2 = Trainer(
        _loss_fn, init_cogact(jax.random.PRNGKey(0), COG),
        TrainerConfig(**{**tcfg.__dict__, "resume": True}),
        OptimizerConfig(learning_rate=1e-3),
    )
    assert trainer2.maybe_resume()
    assert trainer2.step == 4


def test_resume_invariant_rng(tmp_path):
    """fold_in(seed, step) per-step rng: step N uses the same randomness with
    or without a resume in between (ADVICE r1)."""
    params = init_cogact(jax.random.PRNGKey(0), COG)
    tcfg = TrainerConfig(
        output_dir=str(tmp_path / "x"), max_steps=4, per_device_batch_size=1,
        save_steps=2, bf16=False, resume=False,
    )
    batches = [_batch() for _ in range(4)]
    t1 = Trainer(_loss_fn, params, tcfg, OptimizerConfig(learning_rate=1e-3))
    t1.train(iter(batches))

    # same 4 steps, but restart after step 2
    tcfg2 = TrainerConfig(**{**tcfg.__dict__, "output_dir": str(tmp_path / "y"),
                             "max_steps": 2})
    t2 = Trainer(_loss_fn, init_cogact(jax.random.PRNGKey(0), COG), tcfg2,
                 OptimizerConfig(learning_rate=1e-3))
    t2.train(iter(batches[:2]))
    tcfg3 = TrainerConfig(**{**tcfg2.__dict__, "max_steps": 4, "resume": True})
    t3 = Trainer(_loss_fn, init_cogact(jax.random.PRNGKey(1), COG), tcfg3,
                 OptimizerConfig(learning_rate=1e-3))
    t3.train(iter(batches[2:]))

    for a, b in zip(
        jax.tree_util.tree_leaves(jax.tree.map(np.asarray, t1.params)),
        jax.tree_util.tree_leaves(jax.tree.map(np.asarray, t3.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_grad_accumulation_equivalence(tmp_path):
    batch = _batch(8)

    # NOTE: each Trainer owns (and donates) its param buffers -> separate init
    t1 = Trainer(
        _loss_fn, init_cogact(jax.random.PRNGKey(0), COG),
        TrainerConfig(output_dir=str(tmp_path / "a"), gradient_accumulation_steps=1,
                      bf16=False, resume=False),
        OptimizerConfig(learning_rate=1e-3),
    )
    t2 = Trainer(
        _loss_fn, init_cogact(jax.random.PRNGKey(0), COG),
        TrainerConfig(output_dir=str(tmp_path / "b"), gradient_accumulation_steps=2,
                      bf16=False, resume=False),
        OptimizerConfig(learning_rate=1e-3),
    )
    rng = jax.random.PRNGKey(7)
    with t1.mesh:
        p1, _, m1 = t1._train_step(t1.params, t1.opt_state, batch, rng)
    with t2.mesh:
        p2, _, m2 = t2._train_step(t2.params, t2.opt_state, batch, rng)
    # same data, different rng split per microbatch -> loss close, both finite
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_tp_fsdp_specs():
    from jax.sharding import PartitionSpec as P

    from dexbotic_tpu.parallel.mesh import make_mesh, tp_fsdp_param_specs

    mesh = make_mesh(data=4, model=2)
    p = init_cogact(jax.random.PRNGKey(0), COG)
    specs = tp_fsdp_param_specs(p, mesh, min_size=64)
    lyr = specs["vlm"]["llm"]["layers"]["attn"]
    # stacked kernels [L, in, out]: q column-parallel, o row-parallel
    assert lyr["q"]["w"] == P(None, "data", "model")
    assert lyr["o"]["w"] == P(None, "model", "data")
    assert specs["vlm"]["llm"]["layers"]["mlp"]["gate"]["w"][2] == "model"
    assert specs["vlm"]["llm"]["layers"]["mlp"]["down"]["w"][1] == "model"


def test_dataloader_and_device_prefetch():
    from dexbotic_tpu.data.loader import DataLoader, device_prefetch

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    def collate(items):
        return {"x": np.stack([it["x"] for it in items])}

    dl = DataLoader(DS(), collate, batch_size=4, num_workers=2, epochs=2, seed=0)
    batches = list(dl)
    assert len(batches) == 4  # 2 epochs x 2 full batches (drop_last)
    assert batches[0]["x"].shape == (4, 3)
    seen = sorted(set(batches[0]["x"][:, 0].astype(int)) | set(batches[1]["x"][:, 0].astype(int)))
    assert len(seen) == 8  # distinct items within an epoch

    dev_batches = list(device_prefetch(iter(batches), size=2))
    assert len(dev_batches) == 4
    assert hasattr(dev_batches[0]["x"], "devices")


def test_dataloader_process_mode_matches_thread_and_slices_hosts():
    """worker_mode='process' (forked decode workers, VERDICT r4 #9): ordered
    delivery identical to thread mode on the same seed, exact epoch coverage,
    the DistributedSampler-style per-host slice, and worker-error surfacing."""
    from dexbotic_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    def collate(items):
        return {"x": np.stack([it["x"] for it in items])}

    dp = list(DataLoader(DS(), collate, batch_size=4, num_workers=3, epochs=2,
                         seed=0, worker_mode="process"))
    dt = list(DataLoader(DS(), collate, batch_size=4, num_workers=3, epochs=2,
                         seed=0, worker_mode="thread"))
    assert len(dp) == len(dt) == 10
    assert all(np.array_equal(a["x"], b["x"]) for a, b in zip(dp, dt))
    seen = sorted(int(v) for b in dp[:5] for v in b["x"][:, 0])
    assert seen == list(range(20))  # exact epoch coverage

    h = [list(DataLoader(DS(), collate, batch_size=4, num_workers=2, epochs=1,
                         seed=0, worker_mode="process", process_id=r,
                         process_count=2)) for r in (0, 1)]
    full = list(DataLoader(DS(), collate, batch_size=4, num_workers=1,
                           epochs=1, seed=0))
    for a, b, f in zip(h[0], h[1], full):
        np.testing.assert_array_equal(np.concatenate([a["x"], b["x"]]), f["x"])

    class BadDS(DS):
        def __getitem__(self, i):
            if i == 7:
                raise ValueError("boom")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(BadDS(), collate, batch_size=4, num_workers=2,
                        epochs=1, seed=0, worker_mode="process"))
