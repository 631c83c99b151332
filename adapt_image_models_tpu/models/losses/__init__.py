from adapt_image_models_tpu.models.losses.cross_entropy import (
    CrossEntropyLoss, BCELossWithLogits, cross_entropy, soft_cross_entropy,
    binary_cross_entropy_with_logits,
)
from adapt_image_models_tpu.models.losses.bmn_loss import (
    BMNLoss, BinaryLogisticRegressionLoss, binary_logistic_loss,
)
from adapt_image_models_tpu.models.losses.ssn_loss import (
    SSNLoss, ohem_hinge_loss, sampler_layout,
)
from adapt_image_models_tpu.models.losses.hvu_loss import HVULoss
