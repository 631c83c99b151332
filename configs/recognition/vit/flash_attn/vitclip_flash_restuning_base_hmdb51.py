# Res-tuning dual-stream ViT_CLIP, HMDB51 (parity: reference flash_attn/vitclip_flash_restuning_base_hmdb51.py)
_base_ = ["../vitclip_base_hmdb51.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ViT_CLIP_FLASH_RES_TUNING",
        input_resolution=224,
        patch_size=16,
        num_frames=16,
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
