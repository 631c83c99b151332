# AIM ViT-B/16, Diving-48, 32x1x1 uniform sampling (reference
# vitclip_base_diving48.py:33; README.md:108: 88.9 top-1; 50 epochs)
_base_ = ["./vitclip_base_k400.py"]

model = dict(
    backbone=dict(num_frames=32),
    cls_head=dict(num_classes=48),
    test_cfg=dict(max_testing_views=4),
)

dataset_type = "VideoDataset"
data_root = "data/diving48/videos"
ann_file_train = "data/diving48/diving48_train_list_videos.txt"
ann_file_val = "data/diving48/diving48_val_list_videos.txt"
img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

# reference vitclip_base_diving48.py:32-53: fused-decord in-decoder
# RandomResizedCrop+flip (train) / center crop (eval), 32x16x1 uniform
train_pipeline = [
    dict(type="FusedDecordInit", fast_rrc=True, rrc_params=(224, (0.5, 1.0)),
         hflip_prob=0.5),
    dict(type="SampleFrames", clip_len=32, frame_interval=16, num_clips=1,
         frame_uniform=True),
    dict(type="DecordDecode"),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=16,
         num_clips=1, frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=64,
    train=dict(ann_file=ann_file_train, data_prefix=data_root,
               pipeline=train_pipeline),
    val=dict(ann_file=ann_file_val, data_prefix=data_root,
             pipeline=test_pipeline),
    test=dict(ann_file=ann_file_val, data_prefix=data_root,
              pipeline=test_pipeline),
)
total_epochs = 50
work_dir = "./work_dirs/vitclip_base_diving48"

# Reference pipeline fidelity overrides: the merged
# reference vitclip_base_diving48.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="FusedDecordInit", fast_rcc=True, cc_params=(224,)),
    dict(type="SampleFrames", clip_len=32, frame_interval=16,
         num_clips=1, frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference vitclip_base_diving48.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup_iters'] = 3
lr_config = _t
del _t
