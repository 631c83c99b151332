# lfb_slowonly_r50_ava_infer (parity: reference configs/detection/lfb/lfb_slowonly_r50_ava_infer.py)
# LFB bank-building inference
# recipe: run the detector with an LFBInferHead to dump long-term features
# (no training; reference lfb_slowonly_r50_ava_infer.py).
_base_ = ["../ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"]

lfb_prefix_path = "data/ava/lfb_half"
dataset_mode = "val"

model = dict(
    roi_head=dict(
        shared_head=dict(
            type="LFBInferHead",
            lfb_prefix_path=lfb_prefix_path,
            dataset_mode=dataset_mode,
            use_half_precision=True)),
)

data = dict(train=None, videos_per_gpu=1)  # reference infer batch
optimizer = None
total_epochs = None
