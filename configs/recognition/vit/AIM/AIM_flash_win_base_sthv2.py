# AIM_FLASH_WIN, SSv2, 32 frames uniform + LabelSmoothing (parity:
# reference AIM/AIM_flash_win_base_sthv2.py)
_base_ = ["../vitclip_base_sthv2.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM_FLASH_WIN",
        input_resolution=224,
        patch_size=16,
        num_frames=32,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.2,
        adapter_scale=1,
        prompt=True,
        wind_attn=True,
        window_size=(16, 7, 7),
        not_shift=True,
        compute_dtype="bfloat16",
        attention_core="fused",
    ),
    cls_head=dict(num_classes=174),
    train_cfg=dict(blending=dict(type="LabelSmoothing", num_classes=174,
                                 smoothing=0.1)),
)

img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)
train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=4, num_clips=1,
         frame_uniform=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=4, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
data = dict(
    videos_per_gpu=32,
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)
work_dir = "./work_dirs/AIM_flash_win_base_sthv2"
