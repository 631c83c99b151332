# AIM_FLASH_DUAL dual-stream (frozen main + trainable side stream), HMDB51 (parity: reference AIM/AIM_flash_dual_base_hmdb51.py)
_base_ = ["../vitclip_base_hmdb51.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM_FLASH_DUAL",
        input_resolution=224,
        patch_size=16,
        num_frames=32,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.2,
        adapter_scale=0.5,
        prompt=True,
        wind_attn=True,
        window_size=(16, 7, 7),
        not_shift=True,
        compute_dtype="bfloat16",
        attention_core="fused",
    ),
    cls_head=dict(num_classes=51),
)
work_dir = "./work_dirs/AIM_flash_dual_base_hmdb51"

data = dict(videos_per_gpu=32)  # reference batch

total_epochs = 30  # reference schedule (the vitclip hmdb51 base uses 20)

# Reference pipeline fidelity overrides: the merged
# reference AIM_flash_dual_base_hmdb51.py pipelines (values regenerated; the
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
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=4, num_clips=2,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference AIM_flash_dual_base_hmdb51.py values; generated)
_t = dict(globals().get('model') or {})
_t['backbone'] = dict(_t.get('backbone') or {})
model = _t
del _t
