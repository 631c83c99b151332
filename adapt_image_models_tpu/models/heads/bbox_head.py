"""BBoxHeadAVA (reference ``mmaction/models/heads/bbox_head.py:14-247``).

Multilabel action classification over RoI features: temporal/spatial pool
-> dropout -> fc. The loss is focal-modulated BCE over classes 1..C-1
(class 0 is the reserved person/background slot) restricted to rows with at
least one positive label — expressed here with a weight mask instead of the
reference's boolean indexing so XLA shapes stay static.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS


@HEADS.register_module()
class BBoxHeadAVA(nn.Module):
    temporal_pool_type: str = "avg"
    spatial_pool_type: str = "max"
    in_channels: int = 2048
    focal_gamma: float = 0.0
    focal_alpha: float = 1.0
    num_classes: int = 81
    dropout_ratio: float = 0.0
    dropout_before_pool: bool = True
    topk: Sequence[int] = (3, 5)
    multilabel: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """x: (B, R, O, O, C) RoI features (temporal dim already pooled by
        the extractor), (B, R, T, H, W, C) shared-head maps (ACRNHead), or
        (B, R, C) pre-pooled features (FBOHead) -> (B, R, num_classes)."""
        if not self.multilabel:
            raise NotImplementedError("BBoxHeadAVA supports multilabel only")
        if self.dropout_before_pool and self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        if x.ndim == 6:  # (B, R, T, H, W, C): pool T with its own mode
            x = x.mean(axis=2) if self.temporal_pool_type == "avg" \
                else x.max(axis=2)
        if x.ndim == 5:
            if self.spatial_pool_type == "max":
                x = x.max(axis=(2, 3))
            else:
                x = x.mean(axis=(2, 3))
        if not self.dropout_before_pool and self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        bias_init=nn.initializers.zeros,
                        name="fc_cls")(x)

    def loss(self, cls_score: jax.Array, labels: jax.Array,
             weights: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """cls_score/labels: (N, num_classes) flattened rois; weights: (N,)
        0 for padded rois. Reference ``bbox_head.py:171-201``: class 0 is
        dropped, only rows with a positive label contribute."""
        scores = cls_score[:, 1:]
        targets = labels[:, 1:]
        pos_rows = (targets.sum(axis=-1) > 0) & (weights > 0)
        bce = (jnp.logaddexp(0.0, scores) - scores * targets)
        pt = jnp.exp(-bce)
        focal = self.focal_alpha * (1 - pt) ** self.focal_gamma * bce
        row_mask = pos_rows.astype(jnp.float32)[:, None]
        denom = jnp.maximum(row_mask.sum() * scores.shape[-1], 1.0)
        loss = (focal * row_mask).sum() / denom

        metrics = {"loss_action_cls": loss}
        probs = jax.nn.sigmoid(scores)
        pred_vec = probs > 0.5
        target_vec = targets > 0.5
        recall, prec = _recall_prec(pred_vec, target_vec, row_mask[:, 0])
        metrics["recall@thr=0.5"] = recall
        metrics["prec@thr=0.5"] = prec
        for k in self.topk:
            k = min(int(k), probs.shape[-1])  # reference guards k vs classes
            kth = jnp.sort(probs, axis=-1)[:, -k][:, None]
            pred_k = probs >= kth
            r_k, p_k = _recall_prec(pred_k, target_vec, row_mask[:, 0])
            metrics[f"recall@top{k}"] = r_k
            metrics[f"prec@top{k}"] = p_k
        return loss, metrics


def _recall_prec(pred_vec, target_vec, row_mask):
    """Masked mean recall/precision (reference ``bbox_head.py:146-153``)."""
    correct = (pred_vec & target_vec).sum(axis=-1).astype(jnp.float32)
    recall = correct / jnp.maximum(target_vec.sum(-1).astype(jnp.float32), 1e-6)
    prec = correct / (pred_vec.sum(-1).astype(jnp.float32) + 1e-6)
    denom = jnp.maximum(row_mask.sum(), 1.0)
    return (recall * row_mask).sum() / denom, (prec * row_mask).sum() / denom
