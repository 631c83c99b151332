from adapt_image_models_tpu.models.heads.i3d_head import I3DHead
from adapt_image_models_tpu.models.heads.tsn_head import TSNHead
from adapt_image_models_tpu.models.heads.misc_heads import (
    TSMHead, SlowFastHead, X3DHead, TimeSformerHead, TPNHead,
)
from adapt_image_models_tpu.models.heads.trn_head import TRNHead
import adapt_image_models_tpu.models.heads.bbox_head  # noqa: F401
from adapt_image_models_tpu.models.heads.ssn_head import SSNHead
from adapt_image_models_tpu.models.heads.fbo_head import (
    FBOHead, FBONonLocal, LFBInferHead,
)
from adapt_image_models_tpu.models.heads.acrn_head import ACRNHead
