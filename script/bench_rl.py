"""One full GRPO iteration on the real TPU at 1b-class actor scale (VERDICT
r4 #8: the RL path had never executed on TPU hardware).

Runs the PRODUCT loop — SimpleVLARLExp.train_rl with mock envs: chunked
sampled rollouts through the OFT-Discrete actor (oft_generate_action with
per-step log-prob capture), binary reward, accuracy filter + redistribution,
and the micro-batched PPO-clip/GRPO update — and reports the loop's own
per-phase timers (timing/gen_s, timing/filter_s, timing/update_s), the
analogue of the reference's codetiming.Timer rows
(/root/reference/dexbotic/exp/simplevla_rl_exp.py:602-660).

Prints one JSON line per RL step plus a summary line; paste the table into
BENCH_NOTES.md.  Scale knobs: BENCH_RL_SCALE=test|1b (default 1b).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dexbotic_tpu.exp import base_exp
    from dexbotic_tpu.exp.oft_exp import OFTModelConfig
    from dexbotic_tpu.exp.rl.grpo import GRPOConfig
    from dexbotic_tpu.exp.rl.rl_trainer import RolloutConfig
    from dexbotic_tpu.exp.simplevla_rl_exp import (
        RLDataLoaderConfig,
        RLEnvConfig,
        SimpleVLARLExp,
    )
    from dexbotic_tpu.exp.trainer import TrainerConfig
    from dexbotic_tpu.models.oft import init_oft

    scale = os.environ.get("BENCH_RL_SCALE", "1b")
    if scale == "test":
        model = OFTModelConfig(
            llm_preset="test", vit_preset="test", action_model_type="Discrete",
            action_dim=7, chunk_size=4, num_bins=64,
        )
        img, size = "28", 28
    else:
        # 1b-class actor: the bench.py '1b' decoder geometry + so400m-224
        # tower (1.33b params, the LIBERO-scale serving config)
        import dataclasses as dc

        from dexbotic_tpu.models import presets
        from dexbotic_tpu.nn.transformer import TransformerConfig

        presets.LLM_PRESETS.setdefault("dex_1b", TransformerConfig(
            vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=16,
            num_kv_heads=16, head_dim=128, intermediate_size=5504,
        ))
        model = OFTModelConfig(
            llm_preset="dex_1b", vit_preset="siglip_so400m_224",
            action_model_type="Discrete", action_dim=7, chunk_size=8,
            num_bins=256,
        )
        img, size = "siglip_224", 224

    exp = SimpleVLARLExp(
        model=model,
        data=base_exp.DataConfig(image_processor=img),
        env=RLEnvConfig(
            env_type="mock", task_names=("lift", "stack"), num_envs=8,
            # finish below the rollout budget so episodes complete (mock
            # success fires at max_steps with p=0.5) instead of truncating
            max_episode_steps=24, obs_dim=(size, size, 3),
        ),
        rl_data=RLDataLoaderConfig(n_samples=4),
        rollout=RolloutConfig(max_env_steps=32, chunk_steps=8,
                              temperature=1.6),
        grpo=GRPOConfig(entropy_coeff=0.001),
        rl_epochs=1,
        rl_steps_per_epoch=int(os.environ.get("BENCH_RL_STEPS", "2")),
        micro_batch_size=8,
        prompt_text_len=16,
        trainer=TrainerConfig(seed=0),
    )
    # bf16 actor params (the Trainer's bf16 policy; fp32 AdamW at 1.33b
    # params would not fit one 16G chip: 5.3G params + 10.6G moments)
    exp.model.build_params = lambda cfg: init_oft(
        jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    params, history = exp.train_rl()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # step 0 carries the jit compiles (minutes through the axon tunnel);
    # report the warm steady state when we have it
    steps = history[1:] if len(history) > 1 else history
    summary = {
        "metric": f"grpo_{scale}_iteration_wall_s",
        "value": round(sum(
            h["timing/gen_s"] + h["timing/filter_s"] + h["timing/update_s"]
            for h in steps) / max(len(steps), 1), 2),
        "unit": "s/step",
        "params_m": round(n_params / 1e6, 1),
        "rollouts_per_step": steps[-1]["num_rollouts"] if steps else 0,
        "gen_s": round(sum(h["timing/gen_s"] for h in steps) / len(steps), 2),
        "filter_s": round(sum(h["timing/filter_s"] for h in steps) / len(steps), 3),
        "update_s": round(sum(h["timing/update_s"] for h in steps) / len(steps), 2),
        "loss_finite": all(
            bool(jnp.isfinite(jnp.asarray(h["loss"]))) for h in steps),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
