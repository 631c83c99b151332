# TimeSformer divided space-time baseline, K400, 8x16 sampling (parity:
# reference configs/recognition/vit/timesformer_k400.py — wd 5e-6)
_base_ = ["./vitclip_base_k400.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="TimeSformer",
        num_frames=8,
        img_size=224,
        patch_size=16,
        embed_dims=768,
        num_heads=12,
        num_transformer_layers=12,
        compute_dtype="bfloat16",
    ),
    cls_head=dict(in_channels=768, num_classes=400),
)

img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321],
    to_bgr=False)
train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=1),
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
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=3,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)
optimizer = dict(weight_decay=5e-6)
work_dir = "./work_dirs/timesformer_k400"

# Reference pipeline fidelity overrides: the merged
# reference timesformer_k400.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=1,
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
