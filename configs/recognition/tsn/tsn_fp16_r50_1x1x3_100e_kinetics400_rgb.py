# tsn_fp16_r50_1x1x3_100e_kinetics400_rgb (parity: reference configs/recognition/tsn/tsn_fp16_r50_1x1x3_100e_kinetics400_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

# Mixed precision: the reference wraps apex/mmcv Fp16OptimizerHook; the
# TPU-native equivalent is bfloat16 compute with fp32 params/LN islands
# (no loss scaling needed on TPU) — one backbone flag.
model = dict(backbone=dict(compute_dtype="bfloat16"))
work_dir = "./work_dirs/tsn_fp16_r50_1x1x3_100e_kinetics400_rgb"
