# TSN flow, 3 segments (parity: reference
# configs/recognition/tsn/tsn_r50_320p_1x1x3_110e_kinetics400_flow.py —
# the 8-segment flow recipe at num_clips=3, batch 32, lr 0.005).
_base_ = ["./tsn_r50_320p_1x1x8_110e_kinetics400_flow.py"]

img_norm_cfg = dict(mean=[128, 128], std=[128, 128])

train_pipeline = [
    dict(type="SampleFrames", clip_len=5, frame_interval=1, num_clips=3),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[128, 128], std=[128, 128]),
    dict(type="FormatShape", input_format="NCHW_Flow"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=5, frame_interval=1, num_clips=3,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW_Flow"),
]

data = dict(
    videos_per_gpu=32,
    train=dict(ann_file="data/kinetics400/kinetics_flow_train_list.txt",
               pipeline=train_pipeline),
    val=dict(ann_file="data/kinetics400/kinetics_flow_val_list.txt",
             pipeline=val_pipeline),
    test=dict(ann_file="data/kinetics400/kinetics_flow_val_list.txt"),
)

optimizer = dict(lr=0.005)

work_dir = "./work_dirs/tsn_r50_320p_1x1x3_110e_kinetics400_flow"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x3_110e_kinetics400_flow.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['step'] = [70, 100]
lr_config = _t
del _t
