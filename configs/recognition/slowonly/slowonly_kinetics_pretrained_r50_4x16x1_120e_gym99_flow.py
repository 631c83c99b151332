# slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow (parity: reference
# configs/recognition/slowonly/slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow.py)
_base_ = "./slowonly_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(pretrained="checkpoints/slowonly_r50_4x16x1_k400.npz",
                           pretrained2d=False, in_channels=2),
             cls_head=dict(num_classes=99))

data = dict(
    videos_per_gpu=24,
    train=dict(ann_file="data/gym/gym99_train_list.txt",
               data_prefix="data/gym/subaction_frames",
               modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    val=dict(ann_file="data/gym/gym99_val_list.txt",
             data_prefix="data/gym/subaction_frames",
             modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    test=dict(ann_file="data/gym/gym99_val_list.txt",
              data_prefix="data/gym/subaction_frames",
              modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
)
total_epochs = 120
work_dir = "./work_dirs/slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow"

optimizer = dict(lr=0.03)  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=4, frame_interval=16, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[128, 128], std=[128, 128]),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=4, frame_interval=16, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[128, 128], std=[128, 128]),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=4, frame_interval=16,
         num_clips=10, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[128, 128], std=[128, 128]),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['policy'] = 'step'
_t['step'] = [90, 110]
lr_config = _t
del _t
