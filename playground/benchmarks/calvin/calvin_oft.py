"""DB-OFT on CALVIN ABC-D."""

from dataclasses import dataclass, field

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.oft_exp import OFTExp, OFTModelConfig


@dataclass
class CalvinOFTExp(OFTExp):
    exp_name: str = "calvin_oft"
    model: OFTModelConfig = field(
        default_factory=lambda: OFTModelConfig(action_model_type="L1", chunk_size=8)
    )
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            dataset_name="calvin_abc", image_processor="clip_336",
        )
    )


if __name__ == "__main__":
    CalvinOFTExp.main()
