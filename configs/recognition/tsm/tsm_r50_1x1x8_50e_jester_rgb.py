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

# Reference pipeline fidelity overrides: the merged
# reference tsm_r50_1x1x8_50e_jester_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="RawFrameDecode"),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5, flip_label_map={0: 1, 1: 0, 6: 7, 7: 6}),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         twice_sample=True, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference tsm_r50_1x1x8_50e_jester_rgb.py values; generated)
_t = dict(globals().get('optimizer') or {})
_t['weight_decay'] = 0.0005
optimizer = _t
del _t
