# tsm_nl_embedded_gaussian_r50_1x1x8_50e_kinetics400_rgb (parity: reference configs/recognition/tsm/tsm_nl_embedded_gaussian_r50_1x1x8_50e_kinetics400_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_kinetics400_rgb.py"

# NonLocal3d after flagged blocks of stages 2/3, segments folded into the
# affinity's temporal axis (reference resnet_tsm.py NL3DWrapper)
model = dict(backbone=dict(
    non_local=((0, 0, 0), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0), (0, 0, 0)),
    non_local_cfg=dict(mode="embedded_gaussian", sub_sample=True),
))
work_dir = "./work_dirs/tsm_nl_embedded_gaussian_r50_1x1x8_50e_kinetics400_rgb"
