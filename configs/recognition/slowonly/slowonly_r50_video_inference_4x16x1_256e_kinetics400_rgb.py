# slowonly_r50_video_inference_4x16x1_256e_kinetics400_rgb (parity: reference configs/recognition/slowonly/slowonly_r50_video_inference_4x16x1_256e_kinetics400_rgb.py)
# Inference-only recipe (no train split / optimizer).
model = dict(
    type="Recognizer3D",
    backbone=dict(type="ResNet3dSlowOnly", depth=50),
    cls_head=dict(type="I3DHead", num_classes=400, in_channels=2048),
    test_cfg=dict(average_clips="prob"),
)

test_pipeline = [
    dict(type="SampleFrames", clip_len=4, frame_interval=16, num_clips=10,
         test_mode=True),
    dict(type="DecordInit"),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375]),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    test=dict(type="VideoDataset",
              ann_file="data/kinetics400/kinetics400_val_list_videos.txt",
              data_prefix="data/kinetics400/videos_val",
              pipeline=test_pipeline),
)

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_r50_video_inference_4x16x1_256e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('data') or {})
_t['videos_per_gpu'] = 1
data = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_r50_video_inference_4x16x1_256e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.5
model = _t
del _t
