# AIM adapters on an ImageNet-pretrained ViT-B/16, SSv2 (parity:
# reference configs/recognition/vit/vit_imagenet_ssv2.py —
# num_tadapter=2, adapter_scale=1, LabelSmoothing 0.1)
_base_ = ["./vitclip_base_sthv2.py"]

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
        drop_path_rate=0.2,
        adapter_scale=1,
        num_tadapter=2,
        compute_dtype="bfloat16",
    ),
    cls_head=dict(in_channels=768, num_classes=174),
    test_cfg=dict(max_testing_views=2),
    train_cfg=dict(blending=dict(type="LabelSmoothing", num_classes=174,
                                 smoothing=0.1)),
)
work_dir = "./work_dirs/vit_imagenet_ssv2"
