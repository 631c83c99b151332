# TSN with a torchvision-sourced DenseNet-161 backbone (parity: reference
# configs/recognition/tsn/custom_backbones/
# tsn_dense161_320p_1x1x3_100e_kinetics400_rgb.py — the 'torchvision.'
# prefix resolves to the native DenseNet trunk, models/backbone_sources.py;
# pass a local torch checkpoint path as `pretrained` instead of the
# reference's pretrained=True hub download).
_base_ = ["../tsn_r50_1x1x3_100e_kinetics400_rgb.py"]

model = dict(
    backbone=dict(_delete_=True, type="torchvision.densenet161"),
    cls_head=dict(in_channels=2208, dropout_ratio=0.4),
)

data = dict(videos_per_gpu=12)

optimizer = dict(lr=0.00375)  # reference lr for 8 gpus, batch 12 each

work_dir = "./work_dirs/tsn_dense161_320p_1x1x3_100e_kinetics400_rgb"

# Reference pipeline fidelity overrides: the merged
# reference tsn_dense161_320p_1x1x3_100e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d
