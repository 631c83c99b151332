# swin2d_adapter_patch244_window7_kinetics400_1k (parity: reference configs/recognition/swin/swin2d_adapter_patch244_window7_kinetics400_1k.py)
_base_ = "./swin2d_adapter_base_k400.py"

work_dir = "./work_dirs/swin2d_adapter_patch244_window7_kinetics400_1k"

optimizer = dict(lr=0.001)  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference swin2d_adapter_patch244_window7_kinetics400_1k.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         test_mode=True),
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
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=4,
         test_mode=True),
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
# reference swin2d_adapter_patch244_window7_kinetics400_1k.py values; generated)
_t = dict(globals().get('model') or {})
_t['test_cfg'] = dict(_t.get('test_cfg') or {})
_t['test_cfg']['max_testing_views'] = 4
model = _t
del _t
