"""DB-CogACT on CALVIN ABC-D (reference: playground/benchmarks/calvin/)."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
from dexbotic_tpu.exp.trainer import TrainerConfig


@dataclass
class CalvinCogActExp(CogActExp):
    exp_name: str = "calvin_cogact"
    model: CogActModelConfig = field(
        default_factory=lambda: CogActModelConfig(
            action_model_type="DiT-B", action_dim=7, chunk_size=16,
        )
    )
    # CALVIN euler angles are periodic (registry meta wraps them in DeltaAction)
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            dataset_name="calvin_abc", image_processor="clip_336",
        )
    )
    trainer: TrainerConfig = field(
        default_factory=lambda: TrainerConfig(
            output_dir="./output/calvin_cogact", max_steps=40000,
            gradient_checkpointing=True,
        )
    )


if __name__ == "__main__":
    CalvinCogActExp.main()
