# swin2d_adapter_patch244_window7_kinetics400_1k (parity: reference configs/recognition/swin/swin2d_adapter_patch244_window7_kinetics400_1k.py)
_base_ = "./swin2d_adapter_base_k400.py"

work_dir = "./work_dirs/swin2d_adapter_patch244_window7_kinetics400_1k"

optimizer = dict(lr=0.001)  # reference schedule
