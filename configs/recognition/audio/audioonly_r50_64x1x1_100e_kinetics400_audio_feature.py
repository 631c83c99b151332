# AudioOnly ResNetAudio-R50 K400, pre-extracted log-mel .npy features
# (parity: reference configs/recognition_audio/audioonly/
# audioonly_r50_64x1x1_100e_kinetics400_audio_feature.py +
# configs/_base_/models/audioonly_r50.py — same recipe as the repo's
# resnet_audio_r50 config but with the reference's lr=2.0 schedule).
_base_ = ["./resnet_audio_r50_64x1x1_100e_kinetics400_audio.py"]

model = dict(backbone=dict(in_channels=1, norm_eval=False))

optimizer = dict(lr=2.0)  # reference lr for 8 gpus, batch 160 each
log_config = dict(interval=1)

work_dir = "./work_dirs/audioonly_r50_64x1x1_100e_kinetics400_audio_feature"
