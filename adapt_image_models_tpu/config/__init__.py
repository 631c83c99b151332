from adapt_image_models_tpu.config.config import Config
