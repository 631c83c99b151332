# tsn_r50 test-time ablation 320p/3crop (parity: reference
# configs/recognition/tsn/data_benchmark/tsn_r50_test_320p_1x1x25_3crop_100e_kinetics400_rgb.py)
_base_ = "../tsn_r50_1x1x3_100e_kinetics400_rgb.py"

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    val=dict(data_prefix="data/kinetics400/rawframes_val_320p"),
    test=dict(data_prefix="data/kinetics400/rawframes_val_320p",
              pipeline=test_pipeline),
)

work_dir = "./work_dirs/tsn_r50_test_320p_1x1x25_3crop_100e_kinetics400_rgb"
