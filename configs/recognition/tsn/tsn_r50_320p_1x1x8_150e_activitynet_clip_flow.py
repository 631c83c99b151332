# ActivityNet CLIP-annotation flow variant (parity: reference
# configs/recognition/tsn/tsn_r50_320p_1x1x8_150e_activitynet_clip_flow.py
# — the video_flow recipe over with_offset clip annotations).
_base_ = ["./tsn_r50_320p_1x1x8_150e_activitynet_video_flow.py"]

data = dict(
    videos_per_gpu=8,
    train=dict(ann_file="data/ActivityNet/anet_train_clip.txt",
               with_offset=True),
    val=dict(ann_file="data/ActivityNet/anet_val_clip.txt",
             with_offset=True),
    test=dict(ann_file="data/ActivityNet/anet_val_clip.txt",
              with_offset=True),
)

work_dir = "./work_dirs/tsn_r50_320p_1x1x8_150e_activitynet_clip_flow"

optimizer = dict(lr=0.001)  # reference schedule

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_150e_activitynet_clip_flow.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['step'] = [60, 120]
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_150e_activitynet_clip_flow.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.8
model = _t
del _t
