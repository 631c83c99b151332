# AIM_FLASH (parallel S_Adapter + prompt token) with shifted windows, HMDB51 (parity: reference AIM/AIM_flash_base_hmdb51.py)
_base_ = ["../vitclip_base_hmdb51.py"]

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
        win_prompt=False,
    ),
    cls_head=dict(num_classes=51),
)
work_dir = "./work_dirs/AIM_flash_base_hmdb51"

data = dict(videos_per_gpu=32)  # reference batch

total_epochs = 30  # reference schedule (the vitclip hmdb51 base uses 20)
