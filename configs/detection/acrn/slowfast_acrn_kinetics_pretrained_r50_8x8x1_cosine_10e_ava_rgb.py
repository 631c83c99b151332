# ACRN SlowFast-R50 AVA detection (parity: reference
# configs/detection/acrn/slowfast_acrn_kinetics_pretrained_r50_8x8x1_cosine_10e_ava_rgb.py
# — actor-context relation shared head between RoIAlign and BBoxHeadAVA).
_base_ = ["../ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNet3dSlowFast",
        alpha=4,
        beta_inv=8,
        fusion_kernel=7),
    roi_head=dict(
        bbox_roi_extractor=dict(temporal_pool_mode="max"),
        shared_head=dict(type="ACRNHead", in_channels=4608,
                         out_channels=2304),
        bbox_head=dict(in_channels=2304)),
)

train_pipeline = [
    dict(type="SampleAVAFrames", clip_len=32, frame_interval=2),
    dict(type="RawFrameDecode"),
    dict(type="RandomRescale", scale_range=(256, 320)),
    dict(type="RandomCrop", size=256),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
]
val_pipeline = [
    dict(type="SampleAVAFrames", clip_len=32, frame_interval=2),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
]
data = dict(videos_per_gpu=6,  # reference batch
            train=dict(pipeline=train_pipeline),
            val=dict(pipeline=val_pipeline),
            test=dict(pipeline=val_pipeline))

optimizer = dict(lr=0.075, weight_decay=1e-5)
lr_config = dict(_delete_=True, policy="CosineAnnealing", min_lr=0,
                 warmup="linear", warmup_by_epoch=True, warmup_iters=2,
                 warmup_ratio=0.1)
total_epochs = 10
work_dir = "./work_dirs/ava/slowfast_acrn_r50_8x8"
