# AIM + shifted 3D-window attention, Diving-48 (parity: reference configs/recognition/vit/AIM/AIM_base_diving48.py)
_base_ = ["../vitclip_base_diving48.py"]

model = dict(
    backbone=dict(
        drop_path_rate=0.2, adapter_scale=0.5, num_frames=32,
        wind_attn=True, window_size=(32, 2, 2), not_shift=False,
        prompt=True,
    ),
    cls_head=dict(num_classes=48),
)
work_dir = "./work_dirs/AIM_base_diving48"

optimizer = dict(lr=0.000225)  # reference schedule

data = dict(videos_per_gpu=48)  # reference batch
