"""DB-OFT on ManiSkill2 (reference: playground/benchmarks/maniskill2/
maniskill2_oft.py: L1 head with proprio over the five task suites)."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.oft_exp import OFTExp, OFTModelConfig
from dexbotic_tpu.exp.trainer import TrainerConfig

MANISKILL_SUITES = (
    "maniskill_pickcube+maniskill_stackcube+maniskill_picksingleycb"
    "+maniskill_picksingleegad+maniskill_pickclutterycb"
)


@dataclass
class ManiskillOFTExp(OFTExp):
    exp_name: str = "maniskill2_oft"
    model: OFTModelConfig = field(
        default_factory=lambda: OFTModelConfig(
            action_model_type="L1", use_proprio=True, proprio_dim=9,
        )
    )
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            dataset_name=MANISKILL_SUITES, image_processor="clip_336",
            data_keys=["input_ids", "labels", "action", "image", "state"],
        )
    )
    trainer: TrainerConfig = field(
        default_factory=lambda: TrainerConfig(
            output_dir="./output/maniskill2_oft", max_steps=30000,
            per_device_batch_size=16, save_total_limit=2,
        )
    )


if __name__ == "__main__":
    ManiskillOFTExp.main()
