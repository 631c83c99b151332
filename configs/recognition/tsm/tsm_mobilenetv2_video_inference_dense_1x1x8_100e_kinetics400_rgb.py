# Inference-only dense-sampled TSM-MobileNetV2 over video files (parity:
# reference configs/recognition/tsm/
# tsm_mobilenetv2_video_inference_dense_1x1x8_100e_kinetics400_rgb.py).
model = dict(
    type="Recognizer2D",
    backbone=dict(type="MobileNetV2TSM", num_frames=8),
    cls_head=dict(type="TSMHead", num_classes=400, in_channels=1280,
                  num_segments=8),
    test_cfg=dict(average_clips="prob"),
)

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

test_pipeline = [
    dict(type="DenseSampleFrames", clip_len=1, frame_interval=1,
         num_clips=8, test_mode=True),
    dict(type="DecordInit"),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    test=dict(type="VideoDataset",
              ann_file="data/kinetics400/kinetics400_val_list_videos.txt",
              data_prefix="data/kinetics400/videos_val",
              pipeline=test_pipeline),
)

# Reference hyperparameter fidelity overrides (merged
# reference tsm_mobilenetv2_video_inference_dense_1x1x8_100e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('data') or {})
_t['videos_per_gpu'] = 4
data = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference tsm_mobilenetv2_video_inference_dense_1x1x8_100e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.5
model = _t
del _t
