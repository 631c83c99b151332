# AIM ViT-L/14, K700, 32x3x3 — BASELINE config #5 (parity: reference
# configs/recognition/vit/vitclip_large_k700.py — 33624 GFLOPs, top-1 80.4)
_base_ = ["./vitclip_base_k700.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM",
        input_resolution=224,
        patch_size=14,
        num_frames=32,
        width=1024,
        layers=24,
        heads=16,
        drop_path_rate=0.2,
        adapter_scale=0.5,
        compute_dtype="bfloat16",
        attention_core="fused",
        use_checkpoint=True,
    ),
    cls_head=dict(in_channels=1024, num_classes=700),
    test_cfg=dict(max_testing_views=4),
)

img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321],
    to_bgr=False)
# reference vitclip_large_k700.py:21 samples 32x4 (vs base's 32x16)
train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=4, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=4, num_clips=3,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)

optimizer = dict(paramwise_cfg=dict(custom_keys={
    "class_embedding": dict(decay_mult=0.0),
    "positional_embedding": dict(decay_mult=0.0),
    "temporal_embedding": dict(decay_mult=0.0),
    "ln_1": dict(decay_mult=0.0),
    "ln_2": dict(decay_mult=0.0),
    "ln_pre": dict(decay_mult=0.0),
    "ln_post": dict(decay_mult=0.0),
    "backbone_module": dict(lr_mult=0.1),
}))
work_dir = "./work_dirs/vitclip_large_k700"

# Reference pipeline fidelity overrides: the merged
# reference vitclip_large_k700.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=4, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference vitclip_large_k700.py values; generated)
_t = dict(globals().get('model') or {})
_t['backbone'] = dict(_t.get('backbone') or {})
_t['backbone']['type'] = 'ViT_CLIP'
model = _t
del _t
