from adapt_image_models_tpu.core.metrics import (
    top_k_accuracy, mean_class_accuracy, confusion_matrix,
    mean_average_precision, get_weighted_score,
)
from adapt_image_models_tpu.core.eval_detection import ActivityNetDetection
