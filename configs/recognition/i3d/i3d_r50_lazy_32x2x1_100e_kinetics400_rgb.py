# i3d_r50_lazy_32x2x1_100e_kinetics400_rgb (parity: reference configs/recognition/i3d/i3d_r50_lazy_32x2x1_100e_kinetics400_rgb.py)
_base_ = "./i3d_r50_32x2x1_100e_kinetics400_rgb.py"

# The reference 'lazy' recipe composes crop/flip/resize into one warp via
# lazy ops + Fuse (augmentations.py _init_lazy_if_proper). This build's
# two-stage compiled pipeline ALWAYS fuses the geometric chain, so the
# recipe is identical to the base one; Fuse parses as a documented no-op.
work_dir = "./work_dirs/i3d_r50_lazy_32x2x1_100e_kinetics400_rgb"
