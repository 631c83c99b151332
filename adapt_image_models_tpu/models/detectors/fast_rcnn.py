"""FastRCNN-style spatio-temporal action detector for AVA.

The reference builds this from mmdet (``type='FastRCNN'`` with an
``AVARoIHead``; see the AVA configs and
``/root/reference/mmaction/models/heads/bbox_head.py`` /
``roi_extractors/single_straight3d.py``). TPU-native shape: proposals are
assigned/sampled on the HOST (data pipeline, ``core/bbox.py``) into
fixed-shape (R, 4) boxes + (R, C) multi-hot targets + (R,) weights; this
module is the pure jittable part — backbone features, RoIAlign, bbox head.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import (
    BACKBONES, DETECTORS, HEADS,
)
from adapt_image_models_tpu.models.roi_extractors import SingleRoIExtractor3D


@DETECTORS.register_module()
class FastRCNN(nn.Module):
    """Two-stage detector with external proposals (AVA person boxes)."""

    backbone: Dict[str, Any]
    roi_head: Dict[str, Any]
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        # flax freezes dict attributes; the registry wants plain dicts
        self.backbone_module = BACKBONES.build(dict(self.backbone))
        extractor_cfg = dict(self.roi_head["bbox_roi_extractor"])
        extractor_cfg.pop("type", None)
        self.bbox_roi_extractor = SingleRoIExtractor3D(**extractor_cfg)
        head_cfg = dict(self.roi_head["bbox_head"])
        head_cfg.pop("type", None)
        self.bbox_head_module = HEADS.get("BBoxHeadAVA")(**head_cfg)

    def extract_feat(self, imgs: jax.Array,
                     deterministic: bool = True) -> jax.Array:
        """imgs: (B, C, T, H, W) -> backbone feature map (B, T', H', W', C')."""
        return self.backbone_module(imgs, deterministic=deterministic)

    def __call__(self, imgs: jax.Array, rois: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """imgs: (B, C, T, H, W); rois: (B, R, 4) input-image pixel boxes
        -> (B, R, num_classes) action logits."""
        feat = self.extract_feat(imgs, deterministic=deterministic)
        roi_feat = self.bbox_roi_extractor(feat, rois)  # (B, R, O, O, C)
        return self.bbox_head_module(roi_feat, deterministic=deterministic)

    def loss(self, cls_score, labels, weights):
        b, r, c = cls_score.shape
        return self.bbox_head_module.loss(cls_score.reshape(b * r, c),
                                          labels.reshape(b * r, c),
                                          weights.reshape(b * r))
