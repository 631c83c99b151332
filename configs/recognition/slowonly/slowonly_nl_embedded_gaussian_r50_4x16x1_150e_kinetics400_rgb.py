# slowonly_nl_embedded_gaussian_r50_4x16x1_150e_kinetics400_rgb (parity: reference configs/recognition/slowonly/slowonly_nl_embedded_gaussian_r50_4x16x1_150e_kinetics400_rgb.py)
_base_ = "./slowonly_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(
    non_local=((0, 0, 0), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0), (0, 0, 0)),
    non_local_cfg=dict(mode="embedded_gaussian", sub_sample=True),
))
total_epochs = 150
work_dir = "./work_dirs/slowonly_nl_embedded_gaussian_r50_4x16x1_150e_kinetics400_rgb"

optimizer = dict(lr=0.01)  # reference schedule

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_nl_embedded_gaussian_r50_4x16x1_150e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['policy'] = 'step'
_t['step'] = [90, 130]
_t['warmup'] = 'linear'
_t['warmup_iters'] = 10
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_nl_embedded_gaussian_r50_4x16x1_150e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup_by_epoch'] = True
lr_config = _t
del _t
