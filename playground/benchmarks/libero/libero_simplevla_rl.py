"""SimpleVLA-RL (GRPO) post-training of OFT-Discrete on LIBERO
(reference: playground/benchmarks/libero/libero_simplevla_rl.py)."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp.oft_exp import OFTModelConfig
from dexbotic_tpu.exp.simplevla_rl_exp import RLEnvConfig, SimpleVLARLExp


@dataclass
class LiberoSimpleVLARLExp(SimpleVLARLExp):
    exp_name: str = "libero_simplevla_rl"
    model: OFTModelConfig = field(
        default_factory=lambda: OFTModelConfig(
            action_model_type="Discrete", action_dim=7, chunk_size=8,
        )
    )
    env: RLEnvConfig = field(
        default_factory=lambda: RLEnvConfig(
            env_type="libero", task_suite_name="libero_spatial", num_envs=16,
            max_episode_steps=512,
        )
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--task", default="train")
    p.parse_known_args()
    LiberoSimpleVLARLExp().train_rl()
