# tin_tsm_finetune_r50_1x1x8_50e_kinetics400_rgb (parity: reference configs/recognition/tin/tin_tsm_finetune_r50_1x1x8_50e_kinetics400_rgb.py)
_base_ = "./tin_r50_1x1x8_40e_sthv1_rgb.py"

# finetune from a TSM-K400 checkpoint (reference
# tin_tsm_finetune_r50_1x1x8_50e_kinetics400_rgb.py)
model = dict(backbone=dict(pretrained="checkpoints/tsm_r50_k400.npz"),
             cls_head=dict(num_classes=400))

data = dict(
    train=dict(ann_file="data/kinetics400/kinetics400_train_list_rawframes.txt",
               data_prefix="data/kinetics400/rawframes_train",
               filename_tmpl="img_{:05}.jpg"),
    val=dict(ann_file="data/kinetics400/kinetics400_val_list_rawframes.txt",
             data_prefix="data/kinetics400/rawframes_val",
             filename_tmpl="img_{:05}.jpg"),
    test=dict(ann_file="data/kinetics400/kinetics400_val_list_rawframes.txt",
              data_prefix="data/kinetics400/rawframes_val",
              filename_tmpl="img_{:05}.jpg"),
)
optimizer = dict(lr=0.01)
total_epochs = 50
work_dir = "./work_dirs/tin_tsm_finetune_r50_1x1x8_50e_kinetics400_rgb"
