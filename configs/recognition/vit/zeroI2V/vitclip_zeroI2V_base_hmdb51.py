# ZeroI2V STDHA + bottleneck-192 adapters, HMDB51 (parity: reference zeroI2V/vitclip_zeroI2V_base_hmdb51.py)
_base_ = ["../vitclip_base_hmdb51.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ViT_CLIP_ZEROI2V",
        input_resolution=224,
        patch_size=16,
        num_frames=16,
        width=768,
        layers=12,
        heads=12,
        drop_path_rate=0.2,
        adapter_scale=0.5,
        with_t_cls_token=True,
        linear_adapter=False,
        bottleneck=192,
        share_adapter=False,
        shift_type="ths",
        compute_dtype="bfloat16",
    ),
    cls_head=dict(num_classes=51),
)
work_dir = "./work_dirs/vitclip_zeroI2V_base_hmdb51"

total_epochs = 30  # reference schedule
