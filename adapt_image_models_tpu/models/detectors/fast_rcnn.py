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
        # optional shared head between roi extraction and classification:
        # ACRNHead (actor-context relation, reference configs/detection/acrn)
        # or FBOHead (long-term feature bank, reference configs/detection/lfb)
        shared = (self.roi_head.get("shared_head")
                  if isinstance(self.roi_head, dict) else None)
        if shared:
            scfg = dict(shared)
            stype = scfg.pop("type")
            if stype == "FBOHead":
                scfg.pop("lfb_cfg", None)  # bank sampling is host-side;
                # the sampled window arrives as the ``lt_feat`` input
            self.shared_kind = stype
            self.shared_head_module = HEADS.get(stype)(**scfg)
        else:
            self.shared_kind = None
            self.shared_head_module = None
        head_cfg = dict(self.roi_head["bbox_head"])
        head_cfg.pop("type", None)
        self.bbox_head_module = HEADS.get("BBoxHeadAVA")(**head_cfg)

    def extract_feat(self, imgs: jax.Array,
                     deterministic: bool = True) -> jax.Array:
        """imgs: (B, C, T, H, W) -> backbone feature map (B, T', H', W', C').

        Tuple-returning backbones (SlowFast pathways) are fused by
        temporal-pooling each pathway and concatenating channels — the
        reference's per-pathway temporal pool + concat
        (``single_straight3d.py:103-112``) folded into extraction, honoring
        the extractor's ``temporal_pool_mode`` (max for the reference's
        slowfast_temporal_max AVA variant)."""
        feat = self.backbone_module(imgs, deterministic=deterministic)
        if isinstance(feat, (tuple, list)):
            pool = (jnp.max if getattr(self.bbox_roi_extractor,
                                       "temporal_pool_mode", "avg") == "max"
                    else jnp.mean)
            feat = jnp.concatenate(
                [pool(f, axis=1, keepdims=True) for f in feat], axis=-1)
        return feat

    def __call__(self, imgs: jax.Array, rois: jax.Array,
                 lt_feat: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """imgs: (B, C, T, H, W); rois: (B, R, 4) input-image pixel boxes;
        lt_feat: (B, R, L, C_lt) long-term bank window (FBO models only)
        -> (B, R, num_classes) action logits."""
        feat = self.extract_feat(imgs, deterministic=deterministic)
        roi_feat = self.bbox_roi_extractor(feat, rois)  # (B, R, O, O, C)
        if self.shared_kind == "ACRNHead":
            roi_feat = self.shared_head_module(roi_feat, feat,
                                               deterministic=deterministic)
        elif self.shared_kind == "FBOHead":
            if lt_feat is None:
                raise ValueError("FBO models need the sampled LFB window "
                                 "as the lt_feat argument")
            if lt_feat.ndim == 3:  # (B, L, C): one bank window per sample,
                # shared by all its rois (reference lfb_infer semantics)
                r = rois.shape[1]
                lt_feat = jnp.broadcast_to(
                    lt_feat[:, None],
                    (lt_feat.shape[0], r) + lt_feat.shape[1:])
            roi_feat = self.shared_head_module(roi_feat, lt_feat,
                                               deterministic=deterministic)
        return self.bbox_head_module(roi_feat, deterministic=deterministic)

    def loss(self, cls_score, labels, weights):
        b, r, c = cls_score.shape
        return self.bbox_head_module.loss(cls_score.reshape(b * r, c),
                                          labels.reshape(b * r, c),
                                          weights.reshape(b * r))
