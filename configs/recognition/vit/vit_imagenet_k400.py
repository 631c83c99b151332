# AIM adapters on an ImageNet-pretrained timm ViT-B/16, K400
# (parity: reference configs/recognition/vit/vit_imagenet_k400.py)
_base_ = ["./vitclip_base_k400_8frames.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ViT_ImageNet",
        img_size=224,
        patch_size=16,
        num_frames=8,
        embed_dim=768,
        depth=12,
        num_heads=12,
        drop_path_rate=0.1,
        adapter_scale=0.5,
        compute_dtype="bfloat16",
    ),
    cls_head=dict(num_classes=400, in_channels=768),
)
# ImageNet normalization instead of CLIP's
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_bgr=False)
work_dir = "./work_dirs/vit_imagenet_k400"
