# BMN on ActivityNet features (parity: reference
# configs/localization/bmn/bmn_400x100_2x8_9e_activitynet_feature.py +
# _base_/models/bmn_400x100.py).
model = dict(
    type="BMN",
    temporal_dim=100,
    boundary_ratio=0.5,
    num_samples=32,
    num_samples_per_bin=3,
    feat_dim=400,
    soft_nms_alpha=0.4,
    soft_nms_low_threshold=0.5,
    soft_nms_high_threshold=0.9,
    post_process_top_k=100,
)

dataset_type = "ActivityNetDataset"
data_root = "data/ActivityNet/activitynet_feature_cuhk/csv_mean_100"
ann_file_train = "data/ActivityNet/anet_anno_train.json"
ann_file_val = "data/ActivityNet/anet_anno_val.json"

train_pipeline = [
    dict(type="LoadLocalizationFeature"),
    dict(type="GenerateLocalizationLabels"),
]
val_pipeline = train_pipeline
test_pipeline = [dict(type="LoadLocalizationFeature")]

data = dict(
    videos_per_gpu=8,
    workers_per_gpu=8,
    train_dataloader=dict(drop_last=True),
    val_dataloader=dict(videos_per_gpu=1),
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root, pipeline=test_pipeline),
)
evaluation = dict(interval=1, metrics=["AR@AN"])

optimizer = dict(type="Adam", lr=0.001, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy="step", step=[7])
total_epochs = 9
checkpoint_config = dict(interval=1)
work_dir = "./work_dirs/bmn_400x100_2x8_9e_activitynet_feature"
output_config = dict(out=f"{work_dir}/results.json", output_format="json")
