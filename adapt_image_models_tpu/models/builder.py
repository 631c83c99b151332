"""Model registries (parity: ``mmaction/models/builder.py``).

``build_model`` resolves a recognizer config into a flax module. Unlike the
reference there is no nn.Module state — models are pure functions over param
pytrees; "building" returns the module definition only.
"""

from adapt_image_models_tpu.utils.registry import Registry

BACKBONES = Registry("backbone")
NECKS = Registry("neck")
HEADS = Registry("head")
RECOGNIZERS = Registry("recognizer")
DETECTORS = Registry("detector")
LOSSES = Registry("loss")


def build_backbone(cfg):
    # 'torchvision.*' / 'timm.*' / 'mmcls.*' source prefixes resolve to the
    # native equivalent (reference recognizers/base.py:42-75)
    from adapt_image_models_tpu.models.backbone_sources import (
        resolve_backbone_source,
    )
    return BACKBONES.build(resolve_backbone_source(dict(cfg)))


def build_neck(cfg):
    return NECKS.build(cfg)


def build_head(cfg):
    return HEADS.build(cfg)


def build_loss(cfg):
    return LOSSES.build(cfg)


def build_recognizer(cfg, train_cfg=None, test_cfg=None):
    return RECOGNIZERS.build(cfg, train_cfg=train_cfg, test_cfg=test_cfg)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    args = dict(cfg)
    args.setdefault("train_cfg", train_cfg)
    args.setdefault("test_cfg", test_cfg)
    return DETECTORS.build(args)


def _validate_submodule_types(cfg):
    """Fail at BUILD time on unregistered sub-module types.

    Flax modules construct their children lazily at trace time, so without
    this a typo'd ``backbone.type`` only errors at ``model.init`` — after
    a user has potentially waited through data setup. Source-prefixed
    backbones (``torchvision.*``/``timm.*``/``mmcls.*``) are resolved by
    ``build_backbone`` later and skipped here."""
    checks = (("backbone", BACKBONES), ("neck", NECKS), ("cls_head", HEADS))
    for key, registry in checks:
        sub = cfg.get(key)
        if not isinstance(sub, dict):
            continue
        name = sub.get("type", "")
        if "." in name:  # external-source prefix, resolved lazily
            continue
        if name and name not in registry:
            raise KeyError(f"{name} is not registered in {registry.name}. "
                           f"Available: {sorted(registry.module_dict)}")


def build_model(cfg, train_cfg=None, test_cfg=None):
    """Build a recognizer or detector from its config."""
    args = dict(cfg)
    obj_type = args.get("type", "")
    if obj_type in RECOGNIZERS:
        _validate_submodule_types(args)
        return build_recognizer(cfg, train_cfg=train_cfg, test_cfg=test_cfg)
    if obj_type in DETECTORS:
        return build_detector(cfg, train_cfg=train_cfg, test_cfg=test_cfg)
    raise KeyError(f"{obj_type} is not a registered recognizer/detector")
