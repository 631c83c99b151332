# TSN video recipe + Mixup blending (parity: reference
# configs/recognition/tsn/tsn_r50_video_mixup_1x1x8_100e_kinetics400_rgb.py).
_base_ = ["./tsn_r50_video_1x1x8_100e_kinetics400_rgb.py"]

model = dict(train_cfg=dict(
    blending=dict(type="MixupBlending", num_classes=400, alpha=0.2)))

work_dir = "./work_dirs/tsn_r50_video_mixup_1x1x8_100e_kinetics400_rgb"
