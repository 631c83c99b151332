# ZeroI2V ViT-B/16 with STDHA head shift + linear adapters, K400
# (parity: reference configs/recognition/vit/zeroI2V/*)
_base_ = ["../vitclip_base_k400.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ViT_CLIP_ZEROI2V",
        input_resolution=224,
        patch_size=16,
        num_frames=8,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.1,
        adapter_scale=0.5,
        linear_adapter=True,
        share_adapter=False,
        bottleneck=192,
        shift_type="ths",
        compute_dtype="bfloat16",
    ),
    cls_head=dict(num_classes=400),
    test_cfg=dict(max_testing_views=None),
)

img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)
train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=3,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)
work_dir = "./work_dirs/zeroi2v_base_k400"
