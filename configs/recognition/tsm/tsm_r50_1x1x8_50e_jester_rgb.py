# tsm_r50_1x1x8_50e_jester_rgb (parity: reference configs/recognition/tsm/tsm_r50_1x1x8_50e_jester_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=27))

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
work_dir = "./work_dirs/tsm_r50_1x1x8_50e_jester_rgb"
