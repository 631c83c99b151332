# swin2d_adapter_patch244_window7_sthv2_1k (parity: reference configs/recognition/swin/swin2d_adapter_patch244_window7_sthv2_1k.py)
_base_ = "./swin2d_adapter_base_k400.py"

model = dict(cls_head=dict(num_classes=174),
             train_cfg=dict(blending=dict(type="LabelSmoothing",
                                          num_classes=174, smoothing=0.1)))

data = dict(
    train=dict(ann_file="data/sthv2/sthv2_train_list_videos.txt",
               data_prefix="data/sthv2/videos"),
    val=dict(ann_file="data/sthv2/sthv2_val_list_videos.txt",
             data_prefix="data/sthv2/videos"),
    test=dict(ann_file="data/sthv2/sthv2_val_list_videos.txt",
              data_prefix="data/sthv2/videos"),
)
work_dir = "./work_dirs/swin2d_adapter_patch244_window7_sthv2_1k"

total_epochs = 60  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference swin2d_adapter_patch244_window7_sthv2_1k.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0),
    dict(type="Imgaug", transforms=[dict(type="RandAugment", n=4, m=7)]),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="RandomErasing", probability=0.25),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference swin2d_adapter_patch244_window7_sthv2_1k.py values; generated)
_t = dict(globals().get('model') or {})
_t['test_cfg'] = dict(_t.get('test_cfg') or {})
_t['test_cfg']['max_testing_views'] = 2
model = _t
del _t
