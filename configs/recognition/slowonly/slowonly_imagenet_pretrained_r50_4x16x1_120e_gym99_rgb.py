# slowonly_imagenet_pretrained_r50_4x16x1_120e_gym99_rgb (parity: reference configs/recognition/slowonly/slowonly_imagenet_pretrained_r50_4x16x1_120e_gym99_rgb.py)
_base_ = "./slowonly_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(pretrained="torchvision://resnet50",
                           pretrained2d=True),
             cls_head=dict(num_classes=99))

data = dict(
    videos_per_gpu=24,
    train=dict(ann_file="data/gym/gym99_train_list.txt",
               data_prefix="data/gym/subaction_frames"),
    val=dict(ann_file="data/gym/gym99_val_list.txt",
             data_prefix="data/gym/subaction_frames"),
    test=dict(ann_file="data/gym/gym99_val_list.txt",
              data_prefix="data/gym/subaction_frames"),
)
total_epochs = 120
work_dir = "./work_dirs/slowonly_imagenet_pretrained_r50_4x16x1_120e_gym99_rgb"

optimizer = dict(lr=0.03)  # reference schedule

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_imagenet_pretrained_r50_4x16x1_120e_gym99_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['policy'] = 'step'
_t['step'] = [90, 110]
lr_config = _t
del _t
