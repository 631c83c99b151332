# tsm_r50_gpu_normalize_1x1x8_50e_kinetics400_rgb (parity: reference configs/recognition/tsm/tsm_r50_gpu_normalize_1x1x8_50e_kinetics400_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_kinetics400_rgb.py"

# The reference moves Normalize onto the GPU via the GPUNormalize forward
# hook (module_hooks.py:35). This build ALWAYS normalizes on-device: the
# pipeline's Normalize step only records mean/std, and the jitted prepare
# fn applies them fused into the first conv — this recipe is therefore
# identical to the base one and exists for config-surface parity.
work_dir = "./work_dirs/tsm_r50_gpu_normalize_1x1x8_50e_kinetics400_rgb"
