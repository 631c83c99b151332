# Res-tuning dual-stream ViT_CLIP, HMDB51 (parity: reference flash_attn/vitclip_flash_restuning_base_hmdb51.py)
_base_ = ["../vitclip_base_hmdb51.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ViT_CLIP_FLASH_RES_TUNING",
        input_resolution=224,
        patch_size=16,
        num_frames=32,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.2,
        adapter_scale=0.5,
        use_flash_attn=True,
        checkpoint=False,
        compute_dtype="bfloat16",
    ),
    cls_head=dict(num_classes=51),
    test_cfg=dict(max_testing_views=4),
)
work_dir = "./work_dirs/vitclip_flash_restuning_base_hmdb51"

total_epochs = 30  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference vitclip_flash_restuning_base_hmdb51.py pipelines (values regenerated; the
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
# reference vitclip_flash_restuning_base_hmdb51.py values; generated)
_t = dict(globals().get('model') or {})
_t['backbone'] = dict(_t.get('backbone') or {})
model = _t
del _t
