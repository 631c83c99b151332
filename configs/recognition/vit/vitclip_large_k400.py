# AIM ViT-L/14, K400 (parity: reference vitclip_large_k400.py — backbone
# lr_mult=0.1, 341M params / 38M tunable)
_base_ = ["./vitclip_base_k400.py"]

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
        use_checkpoint=True,
    ),
    cls_head=dict(in_channels=1024, num_classes=400),
    test_cfg=dict(max_testing_views=4),
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
work_dir = "./work_dirs/vitclip_large_k400"
