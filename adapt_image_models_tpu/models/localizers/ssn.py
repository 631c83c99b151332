"""SSN — Structured Segment Networks temporal action detector
(reference ``mmaction/models/localizers/ssn.py:10``).

A 2D backbone scores each sampled segment frame; spatial average pooling +
SSNHead produce activity / completeness / regression per proposal. The
test path scores every snippet once (device) and pyramid-pools per proposal
(host), mirroring the reference's fused-test-fc design.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import (
    RECOGNIZERS, build_backbone, build_head, build_loss,
)
from adapt_image_models_tpu.models.heads.ssn_head import stpp_test_pool

Dtype = jnp.dtype


@RECOGNIZERS.register_module()
class SSN(nn.Module):
    backbone: Dict[str, Any]
    cls_head: Dict[str, Any]
    in_channels: int = 3
    spatial_type: str = "avg"
    dropout_ratio: float = 0.5
    loss_cls: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        self.backbone_mod = build_backbone(dict(self.backbone))
        self.head_mod = build_head(dict(self.cls_head))
        self.loss_fn = build_loss(dict(self.loss_cls)
                                  if self.loss_cls else dict(type="SSNLoss"))

    def extract_feat(self, imgs: jax.Array,
                     deterministic: bool = True) -> jax.Array:
        """(N, H, W, C) frames -> (N, C') spatially pooled features."""
        x = self.backbone_mod(imgs, deterministic=deterministic)
        if x.ndim == 4:  # (N, H', W', C')
            if self.spatial_type == "avg":
                x = jnp.mean(x, axis=(1, 2))
            elif self.spatial_type == "max":
                x = jnp.max(x, axis=(1, 2))
            else:
                x = x.reshape(x.shape[0], -1)
        return x

    def __call__(self, imgs: jax.Array, proposal_scale_factor: jax.Array,
                 deterministic: bool = True):
        """Train/forward path (reference ``ssn.py:58-78``):
        imgs (N_proposals * num_segments, H, W, C)."""
        x = self.extract_feat(imgs, deterministic=deterministic)
        if self.dropout_ratio > 0 and not deterministic:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=False)
        return self.head_mod(x, proposal_scale_factor,
                             deterministic=deterministic)

    def forward_train(self, imgs, proposal_scale_factor, proposal_type,
                      proposal_labels, reg_targets,
                      deterministic: bool = False) -> Dict[str, jax.Array]:
        activity, completeness, bbox_preds = self(
            imgs, proposal_scale_factor, deterministic=deterministic)
        return self.loss_fn(activity, completeness, bbox_preds,
                            proposal_type, proposal_labels, reg_targets,
                            self.train_cfg)

    def snippet_scores(self, imgs: jax.Array):
        """Test path, device part: dense per-snippet STPP-part scores."""
        x = self.extract_feat(imgs, deterministic=True)
        return self.head_mod.dense_scores(x)


def ssn_test_post(activity: np.ndarray, completeness: np.ndarray,
                  regression: Optional[np.ndarray],
                  proposal_ticks: np.ndarray, scale_factors: np.ndarray,
                  reg_norm_consts: Optional[np.ndarray],
                  stpp_cfg) -> Dict[str, np.ndarray]:
    """Host post-processing: pyramid pooling + regression denormalization
    (reference ``ssn.py:105-132``)."""
    act, comp, reg = stpp_test_pool(activity, completeness, regression,
                                    proposal_ticks, scale_factors, stpp_cfg)
    if reg is not None and reg_norm_consts is not None:
        k = comp.shape[1]
        reg = reg.reshape(-1, k, 2)
        reg[:, :, 0] = reg[:, :, 0] * reg_norm_consts[1, 0] \
            + reg_norm_consts[0, 0]
        reg[:, :, 1] = reg[:, :, 1] * reg_norm_consts[1, 1] \
            + reg_norm_consts[0, 1]
    return dict(activity_scores=act, completeness_scores=comp,
                bbox_preds=reg)
