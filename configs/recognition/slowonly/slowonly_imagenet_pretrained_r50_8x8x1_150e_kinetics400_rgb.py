# slowonly_imagenet_pretrained_r50_8x8x1_150e_kinetics400_rgb (parity: reference configs/recognition/slowonly/slowonly_imagenet_pretrained_r50_8x8x1_150e_kinetics400_rgb.py)
_base_ = "./slowonly_r50_8x8x1_256e_kinetics400_rgb.py"

# ImageNet-inflated stem (reference pretrained='torchvision://resnet50',
# pretrained2d=True): 2D torchvision weights inflate into the 3D trunk
model = dict(backbone=dict(pretrained="torchvision://resnet50",
                           pretrained2d=True))
total_epochs = 150
work_dir = "./work_dirs/slowonly_imagenet_pretrained_r50_8x8x1_150e_kinetics400_rgb"

optimizer = dict(lr=0.01)  # reference schedule

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_imagenet_pretrained_r50_8x8x1_150e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['policy'] = 'step'
_t['step'] = [90, 130]
_t['warmup'] = 'linear'
_t['warmup_iters'] = 10
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_imagenet_pretrained_r50_8x8x1_150e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup_by_epoch'] = True
lr_config = _t
del _t
