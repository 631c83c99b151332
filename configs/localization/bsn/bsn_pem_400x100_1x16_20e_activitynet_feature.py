# BSN PEM stage on TEM proposals (parity: reference
# configs/localization/bsn/bsn_pem_400x100_1x16_20e_activitynet_feature.py
# + _base_/models/bsn_pem.py).
model = dict(
    type="PEM",
    pem_feat_dim=32,
    pem_hidden_dim=256,
    pem_u_ratio_m=1,
    pem_u_ratio_l=2,
    pem_high_temporal_iou_threshold=0.6,
    pem_low_temporal_iou_threshold=0.2,
    soft_nms_alpha=0.75,
    soft_nms_low_threshold=0.65,
    soft_nms_high_threshold=0.9,
    post_process_top_k=100,
)

dataset_type = "ActivityNetDataset"
data_root = "data/ActivityNet/activitynet_feature_cuhk/csv_mean_100"
ann_file_train = "data/ActivityNet/anet_anno_train.json"
ann_file_val = "data/ActivityNet/anet_anno_val.json"
pgm_proposals_dir = "data/ActivityNet/pgm_proposals"
pgm_features_dir = "data/ActivityNet/pgm_features"

train_pipeline = [
    dict(type="LoadProposals", top_k=500,
         pgm_proposals_dir=pgm_proposals_dir,
         pgm_features_dir=pgm_features_dir),
]
val_pipeline = train_pipeline
test_pipeline = [
    dict(type="LoadProposals", top_k=1000,
         pgm_proposals_dir=pgm_proposals_dir,
         pgm_features_dir=pgm_features_dir),
]

data = dict(
    videos_per_gpu=16,
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

optimizer = dict(type="Adam", lr=0.01, weight_decay=1e-5)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy="step", step=[10])
total_epochs = 20
checkpoint_config = dict(interval=1)
work_dir = "./work_dirs/bsn_400x100_20e_1x16_activitynet_feature"
output_config = dict(out=f"{work_dir}/pem_results.json",
                     output_format="json")
