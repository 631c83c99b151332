# AIM_FLASH, UCF101 split 1 (parity: reference AIM/AIM_flash_base_ucf101.py; 16-frame repo UCF recipe)
_base_ = ["../vitclip_base_ucf101.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="AIM_FLASH",
        input_resolution=224,
        patch_size=16,
        num_frames=16,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.2,
        adapter_scale=0.5,
        prompt=True,
        wind_attn=True,
        window_size=(16, 7, 7),
        not_shift=False,
        compute_dtype="bfloat16",
        attention_core="fused",
    ),
    cls_head=dict(num_classes=101),
)
work_dir = "./work_dirs/AIM_flash_base_ucf101"

data = dict(videos_per_gpu=32)  # reference batch

total_epochs = 30  # reference schedule (the vitclip hmdb51 base uses 20)
