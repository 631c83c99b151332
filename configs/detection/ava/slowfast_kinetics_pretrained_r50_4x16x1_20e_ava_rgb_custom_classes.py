# slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb_custom_classes (parity: reference configs/detection/ava/slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb_custom_classes.py)
_base_ = "./slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"

custom_classes = [1, 4, 8, 11, 14, 17, 28, 59, 74, 80]
model = dict(roi_head=dict(bbox_head=dict(num_classes=11)))

data = dict(
    train=dict(custom_classes=custom_classes, num_classes=11),
    val=dict(custom_classes=custom_classes, num_classes=11),
)
work_dir = "./work_dirs/slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb_custom_classes"

# Reference hyperparameter fidelity overrides (merged
# reference slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb_custom_classes.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup_ratio'] = 0.05
lr_config = _t
del _t
