# TSN-R18 on HVU, attribute category (parity: reference
# configs/recognition/tsn/hvu/tsn_r18_1x1x8_100e_hvu_attribute_rgb.py — the
# per-category sibling of the action recipe; only the tag category,
# class count and annotation files change).
_base_ = ["./tsn_r18_1x1x8_100e_hvu_action_rgb.py"]

model = dict(cls_head=dict(num_classes=117))

data = dict(
    train=dict(ann_file="data/hvu/hvu_attribute_train.json", num_classes=117),
    val=dict(ann_file="data/hvu/hvu_attribute_val.json", num_classes=117),
    test=dict(ann_file="data/hvu/hvu_attribute_val.json", num_classes=117),
)

work_dir = "./work_dirs/tsn_r18_hvu_attribute"
