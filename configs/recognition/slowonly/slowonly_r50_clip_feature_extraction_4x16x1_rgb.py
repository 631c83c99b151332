# slowonly_r50_clip_feature_extraction_4x16x1_rgb (parity: reference configs/recognition/slowonly/slowonly_r50_clip_feature_extraction_4x16x1_rgb.py)
# Feature-
# extraction recipe for tools/misc/clip_feature_extraction.py (no training).
model = dict(
    type="Recognizer3D",
    backbone=dict(type="ResNet3dSlowOnly", depth=50),
    cls_head=dict(type="I3DHead", num_classes=400, in_channels=2048),
    test_cfg=dict(average_clips=None),
)

test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=4, frame_interval=16,
         num_clips=10, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    test=dict(type="RawframeDataset",
              ann_file="data/ActivityNet/anet_val_clip_list.txt",
              data_prefix="data/ActivityNet/rawframes",
              pipeline=test_pipeline),
)

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_r50_clip_feature_extraction_4x16x1_rgb.py values; generated)
_t = dict(globals().get('data') or {})
_t['videos_per_gpu'] = 1
data = _t
del _t
