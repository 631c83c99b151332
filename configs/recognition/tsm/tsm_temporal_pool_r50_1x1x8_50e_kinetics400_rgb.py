# tsm_temporal_pool_r50_1x1x8_50e_kinetics400_rgb (parity: reference configs/recognition/tsm/tsm_temporal_pool_r50_1x1x8_50e_kinetics400_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_kinetics400_rgb.py"

# stride-2 temporal max-pool after stage 2: later blocks shift at T/2 and
# the consensus runs over 4 segments (reference resnet_tsm.py TemporalPool)
model = dict(backbone=dict(temporal_pool=True),
             cls_head=dict(temporal_pool=True))
work_dir = "./work_dirs/tsm_temporal_pool_r50_1x1x8_50e_kinetics400_rgb"
