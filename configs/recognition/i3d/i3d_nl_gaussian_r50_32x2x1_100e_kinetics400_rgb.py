# i3d_nl_gaussian_r50_32x2x1_100e_kinetics400_rgb (parity: reference configs/recognition/i3d/i3d_nl_gaussian_r50_32x2x1_100e_kinetics400_rgb.py)
_base_ = "./i3d_r50_32x2x1_100e_kinetics400_rgb.py"

model = dict(backbone=dict(
    non_local=((0, 0, 0), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0), (0, 0, 0)),
    non_local_cfg=dict(mode="gaussian", sub_sample=True),
))
work_dir = "./work_dirs/i3d_nl_gaussian_r50_32x2x1_100e_kinetics400_rgb"
