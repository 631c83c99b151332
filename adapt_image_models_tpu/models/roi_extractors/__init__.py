from adapt_image_models_tpu.models.roi_extractors.single_straight3d import (
    SingleRoIExtractor3D,
)

__all__ = ["SingleRoIExtractor3D"]
