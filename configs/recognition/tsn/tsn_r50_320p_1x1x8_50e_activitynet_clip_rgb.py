# ActivityNet CLIP-annotation variant: rawframe clips cut from long videos
# with per-clip frame offsets (parity: reference
# configs/recognition/tsn/tsn_r50_320p_1x1x8_50e_activitynet_clip_rgb.py —
# RawframeDataset(with_offset=True, start_index=0,
# filename_tmpl='image_{:05d}.jpg')).
_base_ = ["./tsn_r50_320p_1x1x8_50e_activitynet_video_rgb.py"]

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

_clip_ds = dict(
    type="RawframeDataset",
    data_prefix="data/ActivityNet/rawframes",
    with_offset=True,
    start_index=0,
    filename_tmpl="image_{:05d}.jpg",
)

data = dict(
    videos_per_gpu=8,
    train=dict(_delete_=True, ann_file="data/ActivityNet/anet_train_clip.txt",
               pipeline=train_pipeline, **_clip_ds),
    val=dict(_delete_=True, ann_file="data/ActivityNet/anet_val_clip.txt",
             pipeline=val_pipeline, **_clip_ds),
    test=dict(_delete_=True, ann_file="data/ActivityNet/anet_val_clip.txt",
              pipeline=test_pipeline, **_clip_ds),
)

work_dir = "./work_dirs/tsn_r50_320p_1x1x8_50e_activitynet_clip_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_50e_activitynet_clip_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['step'] = [20, 40]
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_50e_activitynet_clip_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.8
model = _t
del _t
