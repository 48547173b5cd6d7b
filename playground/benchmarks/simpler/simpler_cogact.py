"""DB-CogACT on SimplerEnv (reference: playground/benchmarks/simpler/
simpler_cogact.py: simpler_all data)."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
from dexbotic_tpu.exp.trainer import TrainerConfig


@dataclass
class SimplerCogActExp(CogActExp):
    exp_name: str = "simpler_cogact"
    model: CogActModelConfig = field(default_factory=CogActModelConfig)
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            dataset_name="simpler_all", image_processor="clip_336",
        )
    )
    trainer: TrainerConfig = field(
        default_factory=lambda: TrainerConfig(
            output_dir="./output/simpler_cogact", max_steps=30000,
            per_device_batch_size=16, save_total_limit=2,
        )
    )


if __name__ == "__main__":
    SimplerCogActExp.main()
