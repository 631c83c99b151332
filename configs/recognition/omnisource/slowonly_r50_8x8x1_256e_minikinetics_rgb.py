# slowonly_r50_8x8x1_256e_minikinetics_rgb (parity: reference
# configs/recognition/omnisource/slowonly_r50_8x8x1_256e_minikinetics/...)
_base_ = "../slowonly/slowonly_r50_8x8x1_256e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=200))

data = dict(
    videos_per_gpu=12,
    train=dict(ann_file="data/omnisource/minikinetics_train_list.txt",
               data_prefix="data/omnisource/minikinetics_train"),
    val=dict(ann_file="data/omnisource/minikinetics_val_list.txt",
             data_prefix="data/omnisource/minikinetics_val"),
    test=dict(ann_file="data/omnisource/minikinetics_val_list.txt",
              data_prefix="data/omnisource/minikinetics_val"),
)
work_dir = "./work_dirs/slowonly_r50_8x8x1_256e_minikinetics_rgb"

# reference minikinetics slowonly schedule: lr 0.15 for 8 gpus, batch 12 each
optimizer = dict(lr=0.15)
