from adapt_image_models_tpu.ops.flash_attention import (
    flash_attention_core, fused_attention,
)
