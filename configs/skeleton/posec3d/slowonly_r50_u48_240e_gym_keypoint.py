# slowonly_r50_u48_240e_gym_keypoint (parity: reference configs/skeleton/posec3d/slowonly_r50_u48_240e_gym_keypoint.py)
_base_ = "./slowonly_r50_u48_240e_ntu60_xsub_keypoint.py"

model = dict(cls_head=dict(num_classes=99))

data = dict(
    train=dict(ann_file="data/posec3d/gym_train.pkl"),
    val=dict(ann_file="data/posec3d/gym_val.pkl"),
    test=dict(ann_file="data/posec3d/gym_val.pkl"),
)
work_dir = "./work_dirs/slowonly_r50_u48_240e_gym_keypoint"
