from adapt_image_models_tpu.models.losses.cross_entropy import (
    CrossEntropyLoss, BCELossWithLogits, cross_entropy, soft_cross_entropy,
    binary_cross_entropy_with_logits,
)
