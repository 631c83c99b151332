"""Trainable/frozen parameter partition — the AIM freeze recipe as a pytree split.

Reference behaviour (``vitclip_aim.py:424-427``): every parameter is frozen
except those whose name contains ``temporal_embedding``, ``ln_post`` or
``Adapter`` (plus the classification head, which is a separate module there).

TPU-native expression: instead of ``requires_grad`` flags, the param pytree
is split into (trainable, frozen) sub-trees and the loss is differentiated
w.r.t. the trainable sub-tree only. XLA then never builds gradients for the
frozen CLIP weights — the backward pass still propagates activations through
frozen layers (needed to reach earlier adapters) but skips all frozen dW
matmuls, which is most of the backward FLOPs.
"""

from __future__ import annotations

from typing import Sequence, Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util
from flax.core import FrozenDict

TRAINABLE_KEYWORDS = ("Adapter", "temporal_embedding", "ln_post",
                      # Swin2D-Adapter's learned temporal relative bias is a
                      # new (non-pretrained) temporal parameter
                      "temporal_position_bias_table")
TRAINABLE_MODULES = ("head_module", "cls_head", "fc_cls")


def is_trainable_path(path: Tuple[str, ...]) -> bool:
    """Mirror of the reference's name-based freeze predicate."""
    for part in path:
        for kw in TRAINABLE_KEYWORDS:
            if kw in part:
                return True
        if part in TRAINABLE_MODULES:
            return True
    return False


def _as_dict(params):
    if isinstance(params, FrozenDict):
        return params.unfreeze()
    return params


def trainable_mask(params) -> Any:
    """Bool pytree with the same structure as ``params``."""
    flat = traverse_util.flatten_dict(_as_dict(params))
    mask = {k: is_trainable_path(k) for k in flat}
    return traverse_util.unflatten_dict(mask)


def partition_params(params, freeze_backbone: Optional[bool] = None,
                     frozen_prefixes: Sequence[str] = ()
                     ) -> Tuple[Dict, Dict]:
    """Split into (trainable, frozen) sub-trees.

    ``freeze_backbone=None`` auto-detects: models WITH adapters get the AIM
    freeze (only adapters/temporal/ln_post/head train — the reference's
    recipe); models without adapters (plain CNN/transformer baselines, e.g.
    TSN/SlowOnly/C3D) train everything, exactly like the reference's
    non-adapter configs.

    ``frozen_prefixes``: module-path name prefixes (e.g. ``"conv1"`` or
    ``"layer1_"``) forced into the frozen tree — the CNN families'
    ``frozen_stages`` (without this, the optimizer's weight decay still
    drifts stop-gradient'd weights). The match is anchored to the backbone
    sub-tree when the tree has a top-level ``backbone`` key: a head/neck
    module whose name happens to start with ``conv1`` (e.g. ACRNHead's
    ``conv1_conv``) must stay trainable. Within the backbone (or a bare
    backbone tree) any segment may match, so multi-pathway backbones
    (SlowFast's ``slow_path/conv1``) still freeze correctly.
    """
    flat = traverse_util.flatten_dict(_as_dict(params))
    # recognizer trees name the sub-module 'backbone_module'
    # (models/recognizers), so anchor on the prefix, not equality
    anchored = any(k and k[0].startswith("backbone") for k in flat)

    def prefix_frozen(k):
        parts = k[1:] if anchored and k and k[0].startswith("backbone") \
            else (None if anchored else k)
        if parts is None:
            return False
        return any(part.startswith(p) for p in frozen_prefixes
                   for part in parts)

    if freeze_backbone is None:
        freeze_backbone = any("Adapter" in part for k in flat for part in k)
    if not freeze_backbone:
        train = {k: v for k, v in flat.items() if not prefix_frozen(k)}
        frozen = {k: v for k, v in flat.items() if prefix_frozen(k)}
        return (traverse_util.unflatten_dict(train),
                traverse_util.unflatten_dict(frozen))
    train = {k: v for k, v in flat.items()
             if is_trainable_path(k) and not prefix_frozen(k)}
    frozen = {k: v for k, v in flat.items()
              if not is_trainable_path(k) or prefix_frozen(k)}
    return traverse_util.unflatten_dict(train), traverse_util.unflatten_dict(frozen)


def merge_params(trainable, frozen) -> Dict:
    flat = dict(traverse_util.flatten_dict(_as_dict(frozen)))
    flat.update(traverse_util.flatten_dict(_as_dict(trainable)))
    return traverse_util.unflatten_dict(flat)


def count_params(tree) -> int:
    import math
    return int(sum(math.prod(x.shape) if hasattr(x, "shape") else 0
                   for x in jax.tree_util.tree_leaves(tree)))
