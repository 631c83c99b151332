# slowonly_r101_8x8x1_196e_kinetics400_rgb (parity: reference configs/recognition/slowonly/slowonly_r101_8x8x1_196e_kinetics400_rgb.py)
_base_ = "./slowonly_r50_8x8x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(depth=101))
total_epochs = 196
work_dir = "./work_dirs/slowonly_r101_8x8x1_196e_kinetics400_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_r101_8x8x1_196e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup'] = 'linear'
_t['warmup_iters'] = 34
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_r101_8x8x1_196e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup_ratio'] = 0.1
_t['warmup_by_epoch'] = True
lr_config = _t
del _t
