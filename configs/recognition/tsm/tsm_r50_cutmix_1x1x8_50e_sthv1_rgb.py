# tsm_r50_cutmix_1x1x8_50e_sthv1_rgb (parity: reference configs/recognition/tsm/tsm_r50_cutmix_1x1x8_50e_sthv1_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_sthv1_rgb.py"

model = dict(train_cfg=dict(blending=dict(type="CutmixBlending", num_classes=174, alpha=0.2)))
work_dir = "./work_dirs/tsm_r50_cutmix_1x1x8_50e_sthv1_rgb"

# Reference pipeline fidelity overrides: the merged
# reference tsm_r50_cutmix_1x1x8_50e_sthv1_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         twice_sample=True, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d
