# AIM ViT-L/14, SSv2, 8 frames uniform (parity: reference
# configs/recognition/vit/vitclip_large_sthv2.py — adapter_scale=1,
# LabelSmoothing 0.1; base config's 8x2 frame_uniform pipelines reused)
_base_ = ["./vitclip_base_sthv2.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM",
        input_resolution=224,
        patch_size=14,
        num_frames=8,
        width=1024,
        layers=24,
        heads=16,
        drop_path_rate=0.2,
        adapter_scale=1,
        compute_dtype="bfloat16",
        attention_core="fused",
        use_checkpoint=True,
    ),
    cls_head=dict(in_channels=1024, num_classes=174),
    test_cfg=dict(max_testing_views=2),
    train_cfg=dict(blending=dict(type="LabelSmoothing", num_classes=174,
                                 smoothing=0.1)),
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
work_dir = "./work_dirs/vitclip_large_sthv2"

# Reference hyperparameter fidelity overrides (merged
# reference vitclip_large_sthv2.py values; generated)
_t = dict(globals().get('model') or {})
_t['backbone'] = dict(_t.get('backbone') or {})
_t['backbone']['type'] = 'ViT_CLIP'
model = _t
del _t
