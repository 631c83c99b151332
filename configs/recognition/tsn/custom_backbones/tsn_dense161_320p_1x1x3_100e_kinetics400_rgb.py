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
