from dexbotic_tpu.ops.attention import attention, attention_xla, flash_attention  # noqa: F401
from dexbotic_tpu.ops.masks import (  # noqa: F401
    causal_mask,
    make_attn_mask,
    make_suffix_attn_mask,
    mask_to_bias,
)
from dexbotic_tpu.ops.norms import ada_rms_norm, layer_norm, rms_norm  # noqa: F401
from dexbotic_tpu.ops.rope import apply_rope, rope_cos_sin  # noqa: F401
from dexbotic_tpu.ops.image_ops import make_device_preprocess, resize_matrix  # noqa: F401
