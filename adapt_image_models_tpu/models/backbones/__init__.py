from adapt_image_models_tpu.models.backbones.aim import AIM, AIMBlock, drop_path
