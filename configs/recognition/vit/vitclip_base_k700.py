# AIM ViT-B/16, Kinetics-700 (reference vitclip_base_k700.py: the shipped
# recipe is 8-frame x interval 16, 3-clip ThreeCrop-224 test — NOT the
# README's 32x3x3 table row; same-basename fidelity follows the file)
_base_ = ["./vitclip_base_k400.py"]

model = dict(backbone=dict(num_frames=8), cls_head=dict(num_classes=700))

dataset_type = "VideoDataset"
data_root = "data/kinetics700/train_256"
data_root_val = "data/kinetics700/val_256"
ann_file_train = "data/kinetics700/train_video_list.txt"
ann_file_val = "data/kinetics700/val_video_list.txt"
ann_file_test = "data/kinetics700/val_video_list.txt"
img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=3,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    train=dict(ann_file=ann_file_train, data_prefix=data_root,
               pipeline=train_pipeline),
    val=dict(ann_file=ann_file_val, data_prefix=data_root_val,
             pipeline=test_pipeline),
    test=dict(ann_file=ann_file_test, data_prefix=data_root_val,
              pipeline=test_pipeline),
)
work_dir = "./work_dirs/vitclip_base_k700"

# Reference pipeline fidelity overrides: the merged
# reference vitclip_base_k700.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=16, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
