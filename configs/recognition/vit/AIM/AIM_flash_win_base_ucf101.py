# AIM_FLASH_WIN with temporal-column windows, UCF101 (parity: reference AIM/AIM_flash_win_base_ucf101.py — window (32,1,1), adapter_scale 1)
_base_ = ["../vitclip_base_ucf101.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM_FLASH_WIN",
        input_resolution=224,
        patch_size=16,
        num_frames=16,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.2,
        adapter_scale=1,
        prompt=True,
        wind_attn=True,
        window_size=(32, 1, 1),
        not_shift=True,
        compute_dtype="bfloat16",
        attention_core="fused",
    ),
    cls_head=dict(num_classes=101),
)
work_dir = "./work_dirs/AIM_flash_win_base_ucf101"

data = dict(videos_per_gpu=32)  # reference batch

total_epochs = 30  # reference schedule (the vitclip hmdb51 base uses 20)
