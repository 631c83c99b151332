from adapt_image_models_tpu.convert.clip_import import (
    convert_clip_visual, load_clip_into_params,
)
from adapt_image_models_tpu.convert.aim_import import (
    convert_aim_checkpoint, load_aim_checkpoint_into_params,
)
