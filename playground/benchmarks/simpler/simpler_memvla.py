"""DB-MemVLA on SimplerEnv."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.memvla_exp import MemVLAExp, MemVLAModelConfig


@dataclass
class SimplerMemVLAExp(MemVLAExp):
    exp_name: str = "simpler_memvla"
    model: MemVLAModelConfig = field(default_factory=MemVLAModelConfig)
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            dataset_name="simpler_bridge", image_processor="clip_336",
        )
    )


if __name__ == "__main__":
    SimplerMemVLAExp.main()
