from adapt_image_models_tpu.models.necks.tpn import TPN
