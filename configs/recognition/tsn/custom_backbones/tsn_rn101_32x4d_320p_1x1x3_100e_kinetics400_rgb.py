# TSN with an mmcls-sourced ResNeXt-101 32x4d backbone (parity: reference
# configs/recognition/tsn/custom_backbones/
# tsn_rn101_32x4d_320p_1x1x3_100e_kinetics400_rgb.py — the 'mmcls.' prefix
# resolves to the native grouped-bottleneck ResNeXt,
# models/backbone_sources.py / models/backbones/resnet.py).
_base_ = ["../tsn_r50_1x1x3_100e_kinetics400_rgb.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="mmcls.ResNeXt",
        depth=101,
        num_stages=4,
        out_indices=(3,),
        groups=32,
        width_per_group=4,
        style="pytorch",
    ),
    cls_head=dict(in_channels=2048, dropout_ratio=0.4),
)

optimizer = dict(lr=0.005)  # reference lr for 8 gpus, batch 16 each

work_dir = "./work_dirs/tsn_rn101_32x4d_320p_1x1x3_100e_kinetics400_rgb"

data = dict(videos_per_gpu=16)  # reference batch
