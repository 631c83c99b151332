# AIM_FLASH with shifted windows, Diving-48 (parity: reference AIM/AIM_flash_base_diving48.py)
_base_ = ["../vitclip_base_diving48.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM_FLASH",
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
        window_size=(32, 2, 2),
        not_shift=False,
        compute_dtype="bfloat16",
        attention_core="fused",
        win_prompt=False,
    ),
    cls_head=dict(num_classes=48),
)
work_dir = "./work_dirs/AIM_flash_base_diving48"

data = dict(videos_per_gpu=64)  # reference batch
