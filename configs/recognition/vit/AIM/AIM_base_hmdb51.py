# AIM + shifted 3D-window attention, HMDB51 (parity: reference configs/recognition/vit/AIM/AIM_base_hmdb51.py)
_base_ = ["../vitclip_base_hmdb51.py"]

model = dict(
    backbone=dict(
        drop_path_rate=0.2, adapter_scale=0.5, num_frames=32,
        wind_attn=True, window_size=(32, 2, 2), not_shift=False,
        prompt=True,
    ),
    cls_head=dict(num_classes=51),
)
work_dir = "./work_dirs/AIM_base_hmdb51"

optimizer = dict(lr=0.000225)  # reference schedule

data = dict(videos_per_gpu=48)  # reference batch

total_epochs = 30  # reference schedule (the vitclip hmdb51 base uses 20)

# Reference pipeline fidelity overrides: the merged
# reference AIM_base_hmdb51.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="FusedDecordInit", fast_rcc=True, cc_params=(224,)),
    dict(type="SampleFrames", clip_len=32, frame_interval=16,
         num_clips=1, frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference AIM_base_hmdb51.py values; generated)
_t = dict(globals().get('model') or {})
_t['backbone'] = dict(_t.get('backbone') or {})
_t['backbone']['type'] = 'AIM'
_t['backbone'] = dict(_t.get('backbone') or {})
model = _t
del _t
