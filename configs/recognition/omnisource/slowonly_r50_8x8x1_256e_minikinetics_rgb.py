# slowonly_r50_8x8x1_256e_minikinetics_rgb (parity: reference
# configs/recognition/omnisource/slowonly_r50_8x8x1_256e_minikinetics/...)
_base_ = "../slowonly/slowonly_r50_8x8x1_256e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=200))

data = dict(
    videos_per_gpu=12,
    train=dict(ann_file="data/omnisource/minikinetics_train_list.txt",
               data_prefix="data/omnisource/minikinetics_train"),
    val=dict(ann_file="data/omnisource/minikinetics_val_list.txt",
             data_prefix="data/omnisource/minikinetics_val"),
    test=dict(ann_file="data/omnisource/minikinetics_val_list.txt",
              data_prefix="data/omnisource/minikinetics_val"),
)
work_dir = "./work_dirs/slowonly_r50_8x8x1_256e_minikinetics_rgb"

# reference minikinetics slowonly schedule: lr 0.15 for 8 gpus, batch 12 each
optimizer = dict(lr=0.15)

# Reference pipeline fidelity overrides: the merged
# reference slowonly_r50_8x8x1_256e_minikinetics_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
