# runtime defaults (parity: reference configs/_base_/default_runtime.py;
# dist_params/NCCL is superseded by the JAX mesh — nothing to configure)
checkpoint_config = dict(interval=1)
log_config = dict(interval=20)
log_level = "INFO"
load_from = None
resume_from = None
clip_pretrained = None  # path to a torch CLIP visual state_dict (.pt)
