# slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow (parity: reference
# configs/recognition/slowonly/slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow.py)
_base_ = "./slowonly_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(pretrained="checkpoints/slowonly_r50_4x16x1_k400.npz",
                           pretrained2d=False, in_channels=2),
             cls_head=dict(num_classes=99))

data = dict(
    videos_per_gpu=24,
    train=dict(ann_file="data/gym/gym99_train_list.txt",
               data_prefix="data/gym/subaction_frames",
               modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    val=dict(ann_file="data/gym/gym99_val_list.txt",
             data_prefix="data/gym/subaction_frames",
             modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    test=dict(ann_file="data/gym/gym99_val_list.txt",
              data_prefix="data/gym/subaction_frames",
              modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
)
total_epochs = 120
work_dir = "./work_dirs/slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow"

optimizer = dict(lr=0.03)  # reference schedule
