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

# Reference pipeline fidelity overrides: the merged
# reference tin_tsm_finetune_r50_1x1x8_50e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="MultiScaleCrop", input_size=224, scales=(1, 0.875, 0.75,
         0.66), random_crop=False, max_wh_scale_gap=1),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference tin_tsm_finetune_r50_1x1x8_50e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('optimizer') or {})
_t['weight_decay'] = 0.0001
optimizer = _t
_t = dict(globals().get('lr_config') or {})
_t['policy'] = 'step'
_t['step'] = [20, 40]
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference tin_tsm_finetune_r50_1x1x8_50e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.5
model = _t
del _t
