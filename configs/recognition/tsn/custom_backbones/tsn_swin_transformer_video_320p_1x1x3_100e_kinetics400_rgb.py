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
