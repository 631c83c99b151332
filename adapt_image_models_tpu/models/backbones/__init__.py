from adapt_image_models_tpu.models.backbones.aim import AIM, AIMBlock, drop_path
from adapt_image_models_tpu.models.backbones.vit_clip import ViT_CLIP, patch_shift
from adapt_image_models_tpu.models.backbones.zeroi2v import (
    ViT_CLIP_ZEROI2V, head_shift,
)
from adapt_image_models_tpu.models.backbones.vit_imagenet import ViT_ImageNet
from adapt_image_models_tpu.models.backbones.restuning import (
    ViT_CLIP_RES_TUNING,
)
from adapt_image_models_tpu.models.backbones.swin2d_adapter import (
    SwinTransformer2D_Adapter,
)
from adapt_image_models_tpu.models.backbones.resnet import (
    ResNet, ResNeXt, ResNetTSM, temporal_shift,
)
from adapt_image_models_tpu.models.backbones.densenet import DenseNet
from adapt_image_models_tpu.models.backbones.resnet3d import (
    ResNet3d, ResNet3dSlowOnly, ResNet3dCSN, ResNetAudio, C3D,
)
from adapt_image_models_tpu.models.backbones.timesformer import TimeSformer
from adapt_image_models_tpu.models.backbones.slowfast import (
    ResNet3dSlowFast, X3D,
)
from adapt_image_models_tpu.models.backbones.mobilenet import (
    MobileNetV2, MobileNetV2TSM, TANet, ResNet2Plus1d,
)
from adapt_image_models_tpu.models.backbones.flash_variants import (
    AIM_FLASH, AIM_FLASH_WIN, AIM_FLASH_DUAL,
)
from adapt_image_models_tpu.models.backbones.resnet_tin import ResNetTIN
from adapt_image_models_tpu.models.backbones.swin3d import (
    SwinTransformer3D, SwinTransformer2D,
)
