"""DB-OFT on SimplerEnv (reference: playground/benchmarks/simpler/
simpler_oft.py)."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.oft_exp import OFTExp, OFTModelConfig
from dexbotic_tpu.exp.trainer import TrainerConfig


@dataclass
class SimplerOFTExp(OFTExp):
    exp_name: str = "simpler_oft"
    model: OFTModelConfig = field(
        default_factory=lambda: OFTModelConfig(action_model_type="L1")
    )
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            dataset_name="simpler_all", image_processor="clip_336",
        )
    )
    trainer: TrainerConfig = field(
        default_factory=lambda: TrainerConfig(
            output_dir="./output/simpler_oft", max_steps=30000,
            per_device_batch_size=16, save_total_limit=2,
        )
    )


if __name__ == "__main__":
    SimplerOFTExp.main()
