"""HVU multi-category tag loss (reference
``mmaction/models/losses/hvu_loss.py:9``): masked BCE over the concatenated
tag vector, either jointly ('all') or per category ('individual') with
normalized category weights. Pure function of arrays — jittable; the
'individual' branch avoids the reference's data-dependent skip
(``hvu_loss.py:112``) by weighting each category loss with its (possibly
zero) mask count instead.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.builder import LOSSES


@LOSSES.register_module()
class HVULoss:
    def __init__(self,
                 categories: Sequence[str] = ("action", "attribute",
                                              "concept", "event", "object",
                                              "scene"),
                 category_nums: Sequence[int] = (739, 117, 291, 69, 1678,
                                                 248),
                 category_loss_weights: Optional[Sequence[float]] = None,
                 loss_type: str = "all",
                 with_mask: bool = False,
                 reduction: str = "mean",
                 loss_weight: float = 1.0):
        if category_loss_weights is None:
            category_loss_weights = (1,) * len(category_nums)
        assert len(category_nums) == len(category_loss_weights)
        assert loss_type in ("individual", "all")
        assert reduction in ("mean", "sum")
        assert all(w >= 0 for w in category_loss_weights)
        self.categories = tuple(categories)
        self.category_nums = tuple(category_nums)
        self.category_loss_weights = tuple(category_loss_weights)
        self.loss_type = loss_type
        self.with_mask = with_mask
        self.reduction = reduction
        self.loss_weight = loss_weight
        starts = [0]
        for n in category_nums[:-1]:
            starts.append(starts[-1] + n)
        self.category_startidx = tuple(starts)

    def __call__(self, cls_score: jax.Array, label: jax.Array,
                 mask: Optional[jax.Array] = None,
                 category_mask: Optional[jax.Array] = None
                 ) -> Dict[str, jax.Array]:
        cls_score = cls_score.astype(jnp.float32)
        label = label.astype(jnp.float32)
        per_tag = _bce_none(cls_score, label)

        if self.loss_type == "all":
            if self.with_mask:
                assert mask is not None
                m = mask.astype(jnp.float32)
                w = jnp.sum(per_tag * m, axis=1)
                if self.reduction == "mean":
                    w = w / jnp.maximum(jnp.sum(m, axis=1), 1.0)
                return {"loss_cls": self.loss_weight * jnp.mean(w)}
            if self.reduction == "sum":
                return {"loss_cls":
                        self.loss_weight * jnp.mean(jnp.sum(per_tag, -1))}
            return {"loss_cls": self.loss_weight * jnp.mean(per_tag)}

        # individual: per-category losses + weight-normalized sum
        losses: Dict[str, jax.Array] = {}
        weights: Dict[str, float] = {}
        for idx, (name, num, start) in enumerate(zip(
                self.categories, self.category_nums, self.category_startidx)):
            cat = per_tag[:, start:start + num]
            cat = (jnp.mean(cat, axis=1) if self.reduction == "mean"
                   else jnp.sum(cat, axis=1))
            if self.with_mask:
                assert category_mask is not None
                cm = category_mask[:, idx].astype(jnp.float32).reshape(-1)
                cat_loss = jnp.sum(cat * cm) / jnp.maximum(jnp.sum(cm), 1.0)
            else:
                cat_loss = jnp.mean(cat)
            losses[f"{name}_LOSS"] = cat_loss
            weights[f"{name}_LOSS"] = float(self.category_loss_weights[idx])
        wsum = sum(weights.values()) or 1.0
        weights = {k: v / wsum for k, v in weights.items()}
        loss_cls = sum(losses[k] * weights[k] for k in losses)
        losses["loss_cls"] = self.loss_weight * loss_cls
        losses.update({k + "_weight": jnp.asarray(v)
                       for k, v in weights.items()})
        return losses


def _bce_none(logits, labels):
    """Per-element BCE-with-logits (no reduction)."""
    return (jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
