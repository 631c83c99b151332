# PoseC3D: SlowOnly-R50 on limb pseudo-heatmaps, NTU60 XSub (parity:
# reference configs/skeleton/posec3d/slowonly_r50_u48_240e_ntu60_xsub_limb.py
# — identical to the keypoint recipe except the 17 limb channels)
_base_ = ["./slowonly_r50_u48_240e_ntu60_xsub_keypoint.py"]

model = dict(backbone=dict(in_channels=17))

left_kp = (1, 3, 5, 7, 9, 11, 13, 15)
right_kp = (2, 4, 6, 8, 10, 12, 14, 16)
_pose_target = dict(type="GeneratePoseTarget", sigma=0.6, use_score=True,
                    with_kp=False, with_limb=True)

train_pipeline = [
    dict(type="UniformSampleFrames", clip_len=48),
    dict(type="PoseDecode"),
    dict(type="PoseCompact", hw_ratio=1.0, allow_imgpad=True),
    dict(type="Resize", scale=(-1, 64)),
    dict(type="RandomResizedCrop", area_range=(0.56, 1.0)),
    dict(type="Resize", scale=(56, 56), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5, left_kp=left_kp, right_kp=right_kp),
    dict(_pose_target),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="UniformSampleFrames", clip_len=48, num_clips=1,
         test_mode=True),
    dict(type="PoseDecode"),
    dict(type="PoseCompact", hw_ratio=1.0, allow_imgpad=True),
    dict(type="Resize", scale=(-1, 64)),
    dict(type="CenterCrop", crop_size=64),
    dict(_pose_target),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="UniformSampleFrames", clip_len=48, num_clips=10,
         test_mode=True),
    dict(type="PoseDecode"),
    dict(type="PoseCompact", hw_ratio=1.0, allow_imgpad=True),
    dict(type="Resize", scale=(-1, 64)),
    dict(type="CenterCrop", crop_size=64),
    dict(_pose_target, double=True, left_kp=left_kp, right_kp=right_kp),
    dict(type="FormatShape", input_format="NCTHW"),
]
data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=val_pipeline),
    test=dict(pipeline=test_pipeline),
)
work_dir = "./work_dirs/posec3d_ntu60_xsub_limb"
