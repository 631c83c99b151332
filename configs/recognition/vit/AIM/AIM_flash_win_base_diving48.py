# AIM_FLASH_WIN, Diving-48 (parity: reference AIM/AIM_flash_win_base_diving48.py)
_base_ = ["../vitclip_base_diving48.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM_FLASH_WIN",
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
    cls_head=dict(num_classes=48),
)
work_dir = "./work_dirs/AIM_flash_win_base_diving48"

data = dict(videos_per_gpu=8)  # reference batch
