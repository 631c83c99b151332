from adapt_image_models_tpu.models.detectors.fast_rcnn import FastRCNN

__all__ = ["FastRCNN"]
