# slowonly_imagenet_pretrained_r50_8x8x1_64e_jester_rgb (parity: reference configs/recognition/slowonly/slowonly_imagenet_pretrained_r50_8x8x1_64e_jester_rgb.py)
_base_ = "./slowonly_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(pretrained="torchvision://resnet50",
                           pretrained2d=True),
             cls_head=dict(num_classes=27))

data = dict(
    train=dict(ann_file="data/jester/jester_train_list_rawframes.txt",
               data_prefix="data/jester/rawframes",
               filename_tmpl="{:05}.jpg"),
    val=dict(ann_file="data/jester/jester_val_list_rawframes.txt",
             data_prefix="data/jester/rawframes",
             filename_tmpl="{:05}.jpg"),
    test=dict(ann_file="data/jester/jester_val_list_rawframes.txt",
              data_prefix="data/jester/rawframes",
              filename_tmpl="{:05}.jpg"),
)
total_epochs = 64
work_dir = "./work_dirs/slowonly_imagenet_pretrained_r50_8x8x1_64e_jester_rgb"

# Reference pipeline fidelity overrides: the merged
# reference slowonly_imagenet_pretrained_r50_8x8x1_64e_jester_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=8, frame_interval=4, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5, flip_label_map={0: 1, 1: 0, 6: 7, 7: 6}),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=8, frame_interval=4, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=8, frame_interval=4, num_clips=10,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
