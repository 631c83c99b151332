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

# Reference pipeline fidelity overrides: the merged
# reference vit_imagenet_ssv2.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=2, num_clips=1,
         frame_uniform=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0),
    dict(type="Imgaug", transforms=[dict(type="RandAugment", n=4, m=7)]),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="RandomErasing", probability=0.25),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
