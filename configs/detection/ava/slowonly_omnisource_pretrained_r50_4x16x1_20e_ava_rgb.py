# slowonly_omnisource_pretrained_r50_4x16x1_20e_ava_rgb (parity: reference configs/detection/ava/slowonly_omnisource_pretrained_r50_4x16x1_20e_ava_rgb.py)
_base_ = "./slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"

model = dict(backbone=dict(depth=50, stage_blocks=(3, 4, 6, 3),
                           pretrained="checkpoints/slowonly_r50_omnisource_4x16x1.npz"))
work_dir = "./work_dirs/slowonly_omnisource_pretrained_r50_4x16x1_20e_ava_rgb"
