"""Model zoo exports."""

from dexbotic_tpu.models.cogact import (  # noqa: F401
    CogActConfig, cogact_inference_action, cogact_loss, init_cogact,
)
from dexbotic_tpu.models.discrete_vla import (  # noqa: F401
    DiscreteVLAConfig, discrete_vla_inference_action, discrete_vla_loss,
    init_discrete_vla,
)
from dexbotic_tpu.models.flow_vla import (  # noqa: F401
    FlowVLAConfig, dm0_config, dm0_prog_config, flow_vla_inference_action,
    flow_vla_loss, init_flow_vla, pi0_config, pi05_config,
)
from dexbotic_tpu.models.memvla import (  # noqa: F401
    MemVLAConfig, init_mem_state, init_memvla, memvla_inference_action,
    memvla_loss,
)
from dexbotic_tpu.models.muvla import MUVLAConfig, init_muvla, muvla_loss  # noqa: F401
from dexbotic_tpu.models.navila import NaVILAConfig, init_navila, navila_loss  # noqa: F401
from dexbotic_tpu.models.oft import (  # noqa: F401
    OFTConfig, init_oft, oft_generate_action, oft_inference_action, oft_loss,
)
from dexbotic_tpu.models.vlm import VLMConfig, init_vlm, vlm_forward  # noqa: F401
