"""3D recognizer: backbone + cls head + on-device multi-view aggregation.

Parity targets:
* ``mmaction/models/recognizers/recognizer3d.py:9`` — views folded into the
  batch axis for both train (`:16`) and test; test-time chunking by
  ``max_testing_views`` (`:38-60`).
* ``mmaction/models/recognizers/base.py:160-194`` — ``average_clip`` with
  ``'prob'`` (softmax then mean), ``'score'`` (mean of logits) or ``None``.

TPU-native deltas: everything stays on device as fixed-shape arrays — the
multi-view axis is a static leading dim folded/unfolded by reshape, and the
aggregation is part of the jitted graph (the reference round-trips through
``.cpu().numpy()`` per batch, `recognizer3d.py:90`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import (
    RECOGNIZERS, build_backbone, build_head, build_neck,
)


def average_clip(logits: jax.Array, num_views: int,
                 average_clips: Optional[str] = "prob") -> jax.Array:
    """Aggregate per-view logits -> per-sample scores.

    logits: (B * num_views, C). Returns (B, C).
    """
    b = logits.shape[0] // num_views
    x = logits.reshape(b, num_views, -1).astype(jnp.float32)
    if average_clips is None:
        if num_views != 1:
            raise ValueError("average_clips=None requires a single view")
        return x[:, 0]
    if average_clips == "prob":
        return jnp.mean(jax.nn.softmax(x, axis=-1), axis=1)
    if average_clips == "score":
        return jnp.mean(x, axis=1)
    raise ValueError(f"average_clips must be 'prob', 'score' or None, got {average_clips}")


@RECOGNIZERS.register_module()
class Recognizer3D(nn.Module):
    """Pure-function recognizer. ``__call__`` maps folded-view clips to logits.

    ``backbone``/``cls_head`` are config dicts resolved through the model
    registries (the reference's ``build_from_cfg`` pattern).
    """

    backbone: Dict[str, Any]
    cls_head: Dict[str, Any]
    neck: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        self.backbone_module = build_backbone(dict(self.backbone))
        self.neck_module = build_neck(dict(self.neck)) if self.neck else None
        self.head_module = build_head(dict(self.cls_head))

    def _apply_neck(self, feat, deterministic: bool):
        """Run the neck; sow TPN-style aux logits for the train step's
        aux CE term (reference TPN aux head, ``necks/tpn.py:197-256`` —
        the ``loss_aux`` entry of ``_parse_losses``)."""
        if self.neck_module is None:
            return feat
        out = self.neck_module(feat, deterministic=deterministic)
        if isinstance(out, tuple):
            feat, aux_logits = out
            if aux_logits is not None:
                self.sow("intermediates", "aux_logits", aux_logits)
            return feat
        return out

    def __call__(self, imgs: jax.Array, deterministic: bool = True) -> jax.Array:
        """imgs: (B*, C, T, H, W) with any view multiplicity folded into B*."""
        if imgs.ndim == 6:  # (B, V, C, T, H, W) -> fold views
            b, v = imgs.shape[:2]
            imgs = imgs.reshape((b * v,) + imgs.shape[2:])
        feat = self.backbone_module(imgs, deterministic=deterministic)
        feat = self._apply_neck(feat, deterministic)
        return self.head_module(feat, deterministic=deterministic)

    def extract_feat(self, imgs: jax.Array, deterministic: bool = True) -> jax.Array:
        if imgs.ndim == 6:
            b, v = imgs.shape[:2]
            imgs = imgs.reshape((b * v,) + imgs.shape[2:])
        feat = self.backbone_module(imgs, deterministic=deterministic)
        return self._apply_neck(feat, deterministic)

    def forward_test(self, imgs: jax.Array) -> jax.Array:
        """(B, V, C, T, H, W) -> (B, num_classes) aggregated scores."""
        num_views = imgs.shape[1] if imgs.ndim == 6 else 1
        logits = self(imgs, deterministic=True)
        avg = (self.test_cfg or {}).get("average_clips", "prob")
        return average_clip(logits, num_views, avg)
