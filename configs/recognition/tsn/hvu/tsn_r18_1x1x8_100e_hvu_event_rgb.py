# TSN-R18 on HVU, event category (parity: reference
# configs/recognition/tsn/hvu/tsn_r18_1x1x8_100e_hvu_event_rgb.py — the
# per-category sibling of the action recipe; only the tag category,
# class count and annotation files change).
_base_ = ["./tsn_r18_1x1x8_100e_hvu_action_rgb.py"]

model = dict(cls_head=dict(num_classes=69))

data = dict(
    train=dict(ann_file="data/hvu/hvu_event_train.json", num_classes=69),
    val=dict(ann_file="data/hvu/hvu_event_val.json", num_classes=69),
    test=dict(ann_file="data/hvu/hvu_event_val.json", num_classes=69),
)

work_dir = "./work_dirs/tsn_r18_hvu_event"
