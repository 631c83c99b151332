"""2D (TSN-style) recognizer (reference ``recognizer2d.py``).

Frames (segments) are folded into the batch for a 2D backbone; the head
receives ``(B, S, D)`` segment features and applies avg consensus.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import (
    RECOGNIZERS, build_backbone, build_head, build_neck,
)
from adapt_image_models_tpu.models.recognizers.recognizer3d import average_clip


@RECOGNIZERS.register_module()
class Recognizer2D(nn.Module):
    backbone: Dict[str, Any]
    cls_head: Dict[str, Any]
    neck: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        self.backbone_module = build_backbone(dict(self.backbone))
        self.neck_module = build_neck(dict(self.neck)) if self.neck else None
        self.head_module = build_head(dict(self.cls_head))

    def __call__(self, imgs: jax.Array, deterministic: bool = True) -> jax.Array:
        """imgs: (B, S, C, H, W) segment frames -> (B, num_classes) logits."""
        b, s = imgs.shape[:2]
        x = imgs.reshape((b * s,) + imgs.shape[2:])
        feat = self.backbone_module(x, deterministic=deterministic)
        if self.neck_module is not None:
            # TPN-TSM path (reference ``recognizer2d.py:49-57``): the
            # backbone's per-segment stage maps (B*S, H, W, C) unfold to
            # (B, S, H, W, C) — segments become the pyramid's temporal axis
            feats = feat if isinstance(feat, tuple) else (feat,)
            feats = tuple(f.reshape((b, s) + f.shape[1:]) for f in feats)
            out = self.neck_module(feats, deterministic=deterministic)
            if isinstance(out, tuple):
                feat, aux_logits = out
                if aux_logits is not None:
                    self.sow("intermediates", "aux_logits", aux_logits)
            else:
                feat = out
            return self.head_module(feat, deterministic=deterministic)
        # infer the segment count from the backbone output: a
        # temporal-pooling backbone (ResNetTSM temporal_pool=True) returns
        # fewer per-segment rows than it was fed
        s_out = feat.shape[0] // b
        feat = feat.reshape(b, s_out, -1)
        return self.head_module(feat, deterministic=deterministic)

    def extract_feat(self, imgs: jax.Array,
                     deterministic: bool = True) -> jax.Array:
        """(B, S, C, H, W) -> (B, S_out, D) pooled per-segment features
        (the reference's ``feature_extraction`` branch,
        ``recognizer2d.py:75-83``: spatial average pool per segment)."""
        b, s = imgs.shape[:2]
        x = imgs.reshape((b * s,) + imgs.shape[2:])
        feat = self.backbone_module(x, deterministic=deterministic)
        if isinstance(feat, tuple):
            feat = feat[-1]
        if feat.ndim > 2:  # spatial map (B*S, H, W, C): pool it
            feat = feat.mean(axis=tuple(range(1, feat.ndim - 1)))
        s_out = feat.shape[0] // b
        return feat.reshape(b, s_out, -1)

    def forward_test(self, imgs: jax.Array) -> jax.Array:
        logits = self(imgs, deterministic=True)
        avg = (self.test_cfg or {}).get("average_clips", "prob")
        return average_clip(logits, 1, avg)
