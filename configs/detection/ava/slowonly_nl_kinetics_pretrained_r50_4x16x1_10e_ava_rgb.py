# slowonly_nl_kinetics_pretrained_r50_4x16x1_10e_ava_rgb (parity: reference configs/detection/ava/slowonly_nl_kinetics_pretrained_r50_4x16x1_10e_ava_rgb.py)
_base_ = "./slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"

model = dict(backbone=dict(
    non_local=((0, 0, 0), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0), (0, 0, 0)),
    non_local_cfg=dict(mode="embedded_gaussian", sub_sample=True),
))

data = dict(
    videos_per_gpu=12,
    train=dict(pipeline=[
        dict(type="SampleAVAFrames", clip_len=4, frame_interval=16),
        dict(type="RawFrameDecode"),
        dict(type="RandomRescale", scale_range=(256, 320)),
        dict(type="RandomCrop", size=256),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW", collapse=True),
    ]),
    val=dict(pipeline=[
        dict(type="SampleAVAFrames", clip_len=4, frame_interval=16),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW", collapse=True),
    ]),
)
total_epochs = 10
work_dir = "./work_dirs/slowonly_nl_kinetics_pretrained_r50_4x16x1_10e_ava_rgb"

optimizer = dict(lr=0.3)  # reference schedule

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_nl_kinetics_pretrained_r50_4x16x1_10e_ava_rgb.py values; generated)
_t = dict(globals().get('optimizer') or {})
_t['weight_decay'] = 1e-06
optimizer = _t
_t = dict(globals().get('lr_config') or {})
_t['step'] = [4, 6, 8]
_t['warmup_iters'] = 800
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_nl_kinetics_pretrained_r50_4x16x1_10e_ava_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup_ratio'] = 0.01
lr_config = _t
del _t
