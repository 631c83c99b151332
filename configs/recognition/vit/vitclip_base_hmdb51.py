# AIM ViT-B/16, HMDB51 split 1 (reference vitclip_base_hmdb51.py:33-70:
# fused-decord decode with in-decoder RandomResizedCrop+flip for train and
# center-crop for eval, 32x16x1 uniform sampling)
_base_ = ["./vitclip_base_k400.py"]

model = dict(
    backbone=dict(num_frames=32),
    cls_head=dict(num_classes=51),
    test_cfg=dict(max_testing_views=None),
)

dataset_type = "VideoDataset"
data_root = "data/hmdb51/videos"
ann_file_train = "data/hmdb51/hmdb51_train_split_1_videos.txt"
ann_file_val = "data/hmdb51/hmdb51_val_split_1_videos.txt"
img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

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
total_epochs = 20
work_dir = "./work_dirs/vitclip_base_hmdb51"

# Reference pipeline fidelity overrides: the merged
# reference vitclip_base_hmdb51.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="FusedDecordInit", fast_rcc=True, cc_params=(224,),
         num_threads=8),
    dict(type="SampleFrames", clip_len=32, frame_interval=16,
         num_clips=1, frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
