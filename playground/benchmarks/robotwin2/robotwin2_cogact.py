"""DB-CogACT on RoboTwin2.0."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig


@dataclass
class RoboTwin2CogActExp(CogActExp):
    exp_name: str = "robotwin2_cogact"
    model: CogActModelConfig = field(
        default_factory=lambda: CogActModelConfig(action_dim=14, chunk_size=16)
    )
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            dataset_name="robotwin2_all", image_processor="clip_336",
        )
    )


if __name__ == "__main__":
    RoboTwin2CogActExp.main()
