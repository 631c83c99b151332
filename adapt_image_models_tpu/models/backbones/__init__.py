from adapt_image_models_tpu.models.backbones.aim import AIM, AIMBlock, drop_path
from adapt_image_models_tpu.models.backbones.vit_clip import ViT_CLIP, patch_shift
