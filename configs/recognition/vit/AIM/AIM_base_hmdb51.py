# AIM + shifted 3D-window attention, HMDB51 (parity: reference configs/recognition/vit/AIM/AIM_base_hmdb51.py; 16-frame repo HMDB recipe)
_base_ = ["../vitclip_base_hmdb51.py"]

model = dict(
    backbone=dict(
        drop_path_rate=0.2, adapter_scale=0.5, num_frames=16,
        wind_attn=True, window_size=(32, 2, 2), not_shift=False,
        prompt=True,
    ),
    cls_head=dict(num_classes=51),
)
work_dir = "./work_dirs/AIM_base_hmdb51"

optimizer = dict(lr=0.000225)  # reference schedule

data = dict(videos_per_gpu=48)  # reference batch

total_epochs = 30  # reference schedule (the vitclip hmdb51 base uses 20)
