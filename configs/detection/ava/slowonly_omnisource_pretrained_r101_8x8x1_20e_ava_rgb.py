# slowonly_omnisource_pretrained_r101_8x8x1_20e_ava_rgb (parity: reference configs/detection/ava/slowonly_omnisource_pretrained_r101_8x8x1_20e_ava_rgb.py)
_base_ = "./slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"

model = dict(backbone=dict(depth=101, stage_blocks=(3, 4, 23, 3),
                           pretrained="checkpoints/slowonly_r101_omnisource_8x8x1.npz"))
work_dir = "./work_dirs/slowonly_omnisource_pretrained_r101_8x8x1_20e_ava_rgb"

optimizer = dict(lr=0.075)  # reference schedule

data = dict(videos_per_gpu=6)  # reference batch
