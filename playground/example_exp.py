"""The advertised user contract: subclass the config dataclasses, override
fields, dispatch on --task (reference: playground/example_exp.py).

This example fine-tunes a CogACT policy on a custom Dexdata directory.
"""

from dataclasses import dataclass, field

from dexbotic_tpu.data.registry import register_dataset
from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
from dexbotic_tpu.exp.optim import OptimizerConfig
from dexbotic_tpu.exp.trainer import TrainerConfig

# 1. register your Dexdata directory under a name
register_dataset(
    {
        "demo": {
            "data_path_prefix": "./data/my_robot/video",
            "annotations": "./data/my_robot",
            "frequency": 1,
        }
    },
    prefix="custom",
    meta_data={"non_delta_mask": [6], "periodic_mask": None, "periodic_range": None},
)


# 2. subclass the exp and override what differs
@dataclass
class MyExp(CogActExp):
    exp_name: str = "my_exp"
    model: CogActModelConfig = field(
        default_factory=lambda: CogActModelConfig(
            llm_preset="qwen2_7b", action_dim=7, chunk_size=16,
        )
    )
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(dataset_name="custom_demo")
    )
    optimizer: OptimizerConfig = field(
        default_factory=lambda: OptimizerConfig(
            learning_rate=2e-5, mm_projector_lr=2e-5, action_head_lr=1e-4
        )
    )
    trainer: TrainerConfig = field(
        default_factory=lambda: TrainerConfig(
            output_dir="./output/my_exp", max_steps=10000,
        )
    )


# 3. python example_exp.py --task {train,inference,inference_single,compute_norm_stats}
if __name__ == "__main__":
    MyExp.main()
