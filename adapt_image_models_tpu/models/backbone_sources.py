"""Third-party backbone-source prefixes (``torchvision.*`` / ``timm.*`` /
``mmcls.*``).

Parity: the reference recognizer accepts backbone configs whose ``type``
carries a source prefix and instantiates the module from that library
(``mmaction/models/recognizers/base.py:42-75`` — torchvision types get
their classifier stripped, timm types are created with ``num_classes=0``,
mmcls types go through the mmcls builder). The shipped custom-backbone
configs use ``torchvision.densenet161``, ``timm.swin_base_patch4_window7_224``
and ``mmcls.ResNeXt`` (``configs/recognition/tsn/custom_backbones/``).

TPU-native design: there is no torch module to wrap — each known name
resolves to the equivalent registered flax backbone with the matching
architecture hyper-parameters, so the resulting module follows the
``(B*S, C, H, W) -> (B*S, C_out)`` Recognizer2D feature contract natively
(no classifier to strip). Weights: ``pretrained`` must be a local torch
checkpoint path (converted by the backbone's own loader); ``pretrained=True``
(the torch-hub download convention) is rejected explicitly — this
environment has no egress, and silent random init would be a trap.
"""

from typing import Any, Dict

# torchvision model name -> (registered type, arch kwargs)
_TORCHVISION = {
    "resnet18": ("ResNet", dict(depth=18)),
    "resnet34": ("ResNet", dict(depth=34)),
    "resnet50": ("ResNet", dict(depth=50)),
    "resnet101": ("ResNet", dict(depth=101)),
    "resnet152": ("ResNet", dict(depth=152)),
    "mobilenet_v2": ("MobileNetV2", dict()),
    "densenet121": ("DenseNet", dict(depth=121)),
    "densenet161": ("DenseNet", dict(depth=161)),
    "densenet169": ("DenseNet", dict(depth=169)),
    "densenet201": ("DenseNet", dict(depth=201)),
    "resnext101_32x8d": ("ResNeXt", dict(depth=101, groups=32,
                                         width_per_group=8)),
    "resnext50_32x4d": ("ResNeXt", dict(depth=50, groups=32,
                                        width_per_group=4)),
}

# timm model name -> (registered type, arch kwargs)
_TIMM = {
    "swin_tiny_patch4_window7_224": (
        "SwinTransformer2D",
        dict(patch_size=4, embed_dim=96, depths=(2, 2, 6, 2),
             num_heads=(3, 6, 12, 24), window_size=7)),
    "swin_small_patch4_window7_224": (
        "SwinTransformer2D",
        dict(patch_size=4, embed_dim=96, depths=(2, 2, 18, 2),
             num_heads=(3, 6, 12, 24), window_size=7)),
    "swin_base_patch4_window7_224": (
        "SwinTransformer2D",
        dict(patch_size=4, embed_dim=128, depths=(2, 2, 18, 2),
             num_heads=(4, 8, 16, 32), window_size=7)),
}


def resolve_backbone_source(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Rewrite a source-prefixed backbone config to its native equivalent.

    Returns ``cfg`` unchanged when the type has no source prefix. Raises
    ``KeyError`` (listing the supported names) for unknown prefixed names
    and ``ValueError`` for ``pretrained=True``.
    """
    obj_type = cfg.get("type", "")
    if "." not in obj_type:
        return cfg
    source, name = obj_type.split(".", 1)
    if source not in ("torchvision", "timm", "mmcls"):
        return cfg

    cfg = dict(cfg)
    if cfg.get("pretrained") is True:
        raise ValueError(
            f"{obj_type}: pretrained=True means 'download from torch hub' "
            "in the reference; here pass a local torch checkpoint path "
            "instead (converted on load by the backbone)")

    if source == "mmcls":
        # the mmcls builder shares the mmaction registry protocol — resolve
        # against our own registry (covers e.g. mmcls.ResNet)
        from adapt_image_models_tpu.models.builder import BACKBONES
        if name not in BACKBONES:
            raise KeyError(
                f"mmcls.{name}: no registered equivalent; available "
                f"backbones: {sorted(BACKBONES.module_dict)}")
        cfg["type"] = name
        return cfg

    table = _TORCHVISION if source == "torchvision" else _TIMM
    if name not in table:
        raise KeyError(
            f"{obj_type}: no native equivalent; supported {source} names: "
            f"{sorted(table)}")
    new_type, arch_kwargs = table[name]
    cfg.pop("type")
    merged = dict(arch_kwargs)
    merged.update(cfg)  # explicit config keys win over the arch table
    merged["type"] = new_type
    return merged
