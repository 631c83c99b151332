# ResNetAudio-R50 K400 64x1x1 (parity: reference
# configs/_base_/models/audioonly_r50.py +
# configs/recognition_audio/audioonly/
# audioonly_r50_64x1x1_100e_kinetics400_audio_feature.py — pre-extracted
# .npy log-mel features through AudioFeatureDataset).
model = dict(
    type="AudioRecognizer",
    backbone=dict(type="ResNetAudio", depth=50),
    cls_head=dict(type="AudioTSNHead", num_classes=400, in_channels=1024,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "AudioFeatureDataset"
data_root = "data/kinetics400/audio_feature_train"
data_root_val = "data/kinetics400/audio_feature_val"
ann_file_train = "data/kinetics400/kinetics400_train_list_audio_feature.txt"
ann_file_val = "data/kinetics400/kinetics400_val_list_audio_feature.txt"

train_pipeline = [
    dict(type="LoadAudioFeature"),
    dict(type="SampleFrames", clip_len=64, frame_interval=1, num_clips=1),
    dict(type="AudioFeatureSelector"),
    dict(type="FormatAudioShape", input_format="NCTF"),
]
val_pipeline = [
    dict(type="LoadAudioFeature"),
    dict(type="SampleFrames", clip_len=64, frame_interval=1, num_clips=1,
         test_mode=True),
    dict(type="AudioFeatureSelector"),
    dict(type="FormatAudioShape", input_format="NCTF"),
]
test_pipeline = [
    dict(type="LoadAudioFeature"),
    dict(type="SampleFrames", clip_len=64, frame_interval=1, num_clips=10,
         test_mode=True),
    dict(type="AudioFeatureSelector"),
    dict(type="FormatAudioShape", input_format="NCTF"),
]

data = dict(
    videos_per_gpu=160,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="CosineAnnealing", min_lr=0)
total_epochs = 100
checkpoint_config = dict(interval=5)
work_dir = "./work_dirs/resnet_audio_r50_64x1x1_100e_kinetics400_audio"
