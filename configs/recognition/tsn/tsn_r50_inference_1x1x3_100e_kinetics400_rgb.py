# tsn_r50_inference_1x1x3_100e_kinetics400_rgb (parity: reference configs/recognition/tsn/tsn_r50_inference_1x1x3_100e_kinetics400_rgb.py)
# Inference-only
# recipe: model + test pipeline, no train split / optimizer (reference
# tsn_r50_inference_1x1x3_100e_kinetics400_rgb.py).
model = dict(
    type="Recognizer2D",
    backbone=dict(type="ResNet", depth=50),
    cls_head=dict(type="TSNHead", num_classes=400, in_channels=2048,
                  dropout_ratio=0.4),
    test_cfg=dict(average_clips=None),
)

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    test=dict(type="RawframeDataset",
              ann_file="data/kinetics400/kinetics400_val_list_rawframes.txt",
              data_prefix="data/kinetics400/rawframes_val",
              pipeline=test_pipeline),
)

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_inference_1x1x3_100e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('data') or {})
_t['videos_per_gpu'] = 1
data = _t
del _t
