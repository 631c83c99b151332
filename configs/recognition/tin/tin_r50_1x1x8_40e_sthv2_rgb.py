# tin_r50_1x1x8_40e_sthv2_rgb (parity: reference configs/recognition/tin/tin_r50_1x1x8_40e_sthv2_rgb.py)
_base_ = "./tin_r50_1x1x8_40e_sthv1_rgb.py"

data = dict(
    train=dict(ann_file="data/sthv2/sthv2_train_list_rawframes.txt",
               data_prefix="data/sthv2/rawframes"),
    val=dict(ann_file="data/sthv2/sthv2_val_list_rawframes.txt",
             data_prefix="data/sthv2/rawframes"),
    test=dict(ann_file="data/sthv2/sthv2_val_list_rawframes.txt",
              data_prefix="data/sthv2/rawframes"),
)
work_dir = "./work_dirs/tin_r50_1x1x8_40e_sthv2_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tin_r50_1x1x8_40e_sthv2_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['min_lr'] = 0
lr_config = _t
del _t
