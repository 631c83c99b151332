# slowonly_imagenet_pretrained_r50_8x8x1_64e_jester_rgb (parity: reference configs/recognition/slowonly/slowonly_imagenet_pretrained_r50_8x8x1_64e_jester_rgb.py)
_base_ = "./slowonly_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(pretrained="torchvision://resnet50",
                           pretrained2d=True),
             cls_head=dict(num_classes=27))

data = dict(
    train=dict(ann_file="data/jester/jester_train_list_rawframes.txt",
               data_prefix="data/jester/rawframes",
               filename_tmpl="{:05}.jpg"),
    val=dict(ann_file="data/jester/jester_val_list_rawframes.txt",
             data_prefix="data/jester/rawframes",
             filename_tmpl="{:05}.jpg"),
    test=dict(ann_file="data/jester/jester_val_list_rawframes.txt",
              data_prefix="data/jester/rawframes",
              filename_tmpl="{:05}.jpg"),
)
total_epochs = 64
work_dir = "./work_dirs/slowonly_imagenet_pretrained_r50_8x8x1_64e_jester_rgb"
