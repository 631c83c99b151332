from adapt_image_models_tpu.models.builder import (
    BACKBONES, HEADS, RECOGNIZERS, DETECTORS, LOSSES, NECKS,
    build_backbone, build_head, build_recognizer, build_loss, build_model,
)
import adapt_image_models_tpu.models.backbones  # noqa: F401  (register)
import adapt_image_models_tpu.models.heads  # noqa: F401
import adapt_image_models_tpu.models.recognizers  # noqa: F401
import adapt_image_models_tpu.models.losses  # noqa: F401
import adapt_image_models_tpu.models.detectors  # noqa: F401
import adapt_image_models_tpu.models.localizers  # noqa: F401
import adapt_image_models_tpu.models.necks  # noqa: F401
