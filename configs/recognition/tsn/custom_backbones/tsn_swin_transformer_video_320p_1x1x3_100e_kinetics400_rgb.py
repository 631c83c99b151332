# TSN with a timm-sourced Swin-B backbone (parity: reference
# configs/recognition/tsn/custom_backbones/
# tsn_swin_transformer_video_320p_1x1x3_100e_kinetics400_rgb.py — the
# 'timm.' prefix resolves to the native SwinTransformer2D equivalent,
# models/backbone_sources.py; pass a local torch checkpoint path as
# `pretrained` instead of the reference's pretrained=True hub download).
_base_ = ["../tsn_r50_1x1x3_100e_kinetics400_rgb.py"]

model = dict(
    backbone=dict(_delete_=True,
                  type="timm.swin_base_patch4_window7_224"),
    cls_head=dict(in_channels=1024),
)

work_dir = ("./work_dirs/"
            "tsn_swin_transformer_video_320p_1x1x3_100e_kinetics400_rgb")

optimizer = dict(lr=0.0075)  # reference schedule

data = dict(videos_per_gpu=24)  # reference batch

# Reference pipeline fidelity overrides: the merged
# reference tsn_swin_transformer_video_320p_1x1x3_100e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3),
    dict(type="DecordDecode"),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d
