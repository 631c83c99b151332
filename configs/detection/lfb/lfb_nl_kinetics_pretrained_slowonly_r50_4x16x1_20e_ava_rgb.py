# LFB (non-local fusion) SlowOnly-R50 AVA detection (parity: reference
# configs/detection/lfb/lfb_nl_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb.py).
# The long-term feature bank is sampled host-side (models/lfb.py) and fed
# to the jitted detector as the ``lt_feat`` input.
_base_ = ["../ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"]

lfb_prefix_path = "data/ava/lfb_half"
max_num_sampled_feat = 5
window_size = 60
lfb_channels = 2048

model = dict(
    roi_head=dict(
        shared_head=dict(
            type="FBOHead",
            lfb_cfg=dict(
                lfb_prefix_path=lfb_prefix_path,
                max_num_sampled_feat=max_num_sampled_feat,
                window_size=window_size,
                lfb_channels=lfb_channels,
                dataset_modes=("train", "val")),
            fbo_cfg=dict(
                type="non_local",
                st_feat_channels=2048,
                lt_feat_channels=lfb_channels,
                latent_channels=512,
                num_non_local_layers=2,
                st_feat_dropout_ratio=0.2,
                lt_feat_dropout_ratio=0.2,
                pre_activate=True)),
        bbox_head=dict(in_channels=2560)),  # 2048 + 512 fused
)

optimizer = dict(lr=0.15, weight_decay=1e-5)
total_epochs = 20
work_dir = "./work_dirs/ava/lfb_nl_slowonly_r50_4x16"

data = dict(videos_per_gpu=12)  # reference batch
