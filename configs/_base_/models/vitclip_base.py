# Frozen CLIP ViT-B/16 base model (parity: reference
# configs/_base_/models/vitclip_base.py — backbone type ViT_CLIP, the
# fork's cls-temporal + lambda-blend variant, vit_clip.py:328; the
# canonical AIM recipes override type='AIM' per file like the reference's
# configs/recognition/vit/AIM/*.py do)
model = dict(
    type="Recognizer3D",
    backbone=dict(
        type="ViT_CLIP",
        input_resolution=224,
        patch_size=16,
        num_frames=32,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.1,
        compute_dtype="bfloat16",
        attention_core="fused",  # Pallas fused kernels (TPU); set "xla" for CPU runs
    ),
    cls_head=dict(
        type="I3DHead",
        in_channels=768,
        num_classes=400,
        dropout_ratio=0.5,
    ),
    test_cfg=dict(average_clips="prob"),
)
