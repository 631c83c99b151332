# Frozen CLIP ViT-L/14 + AIM adapters (reference vitclip_large_k400.py:6)
model = dict(
    type="Recognizer3D",
    backbone=dict(
        type="AIM",
        input_resolution=224,
        patch_size=14,
        num_frames=32,
        width=1024,
        layers=24,
        heads=16,
        drop_path_rate=0.1,
        compute_dtype="bfloat16",
        attention_core="fused",  # Pallas fused kernels (TPU); set "xla" for CPU runs
    ),
    cls_head=dict(
        type="I3DHead",
        in_channels=1024,
        num_classes=400,
        dropout_ratio=0.5,
    ),
    test_cfg=dict(average_clips="prob"),
)
