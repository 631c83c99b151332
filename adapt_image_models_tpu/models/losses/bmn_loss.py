"""BMN loss (reference ``mmaction/models/losses/bmn_loss.py``, 180 LoC):
TEM weighted binary logistic on start/end + PEM regression (balanced MSE
over high/mid IoU bands) + PEM classification (weighted binary logistic on
the confidence map).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.builder import LOSSES


def binary_logistic_loss(pred: jax.Array, gt: jax.Array,
                         threshold: float = 0.5) -> jax.Array:
    """Class-balanced binary logistic regression (reference
    ``binary_logistic_regression_loss.py``)."""
    pred = jnp.clip(pred.astype(jnp.float32), 1e-6, 1 - 1e-6)
    pmask = (gt > threshold).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pmask), 1.0)
    num_all = jnp.asarray(pred.size, jnp.float32)
    ratio = jnp.clip(num_all / num_pos, 1.05, 21.0)
    coef_pos = 0.5 * ratio
    coef_neg = 0.5 * ratio / (ratio - 1)
    loss = coef_pos * pmask * jnp.log(pred) \
        + coef_neg * (1.0 - pmask) * jnp.log(1.0 - pred)
    return -jnp.mean(loss)


def tem_loss(pred_start, pred_end, gt_start, gt_end):
    return (binary_logistic_loss(pred_start, gt_start)
            + binary_logistic_loss(pred_end, gt_end))


def pem_reg_loss(pred_reg: jax.Array, gt_iou: jax.Array, bm_mask: jax.Array,
                 high: float = 0.7, low: float = 0.3) -> jax.Array:
    """Band-balanced MSE on the regression confidence channel."""
    pred = pred_reg.astype(jnp.float32)
    gt = gt_iou.astype(jnp.float32)
    u_hmask = ((gt > high) * bm_mask).astype(jnp.float32)
    u_mmask = ((gt <= high) & (gt > low)) * bm_mask
    u_lmask = ((gt <= low) & (gt >= 0)) * bm_mask
    u_mmask = u_mmask.astype(jnp.float32)
    u_lmask = u_lmask.astype(jnp.float32)

    num_h = jnp.maximum(jnp.sum(u_hmask), 1.0)
    num_m = jnp.maximum(jnp.sum(u_mmask), 1.0)
    num_l = jnp.maximum(jnp.sum(u_lmask), 1.0)

    # deterministic band re-weighting (the reference subsamples mid/low bands
    # with random masks to match the high-band count; the expectation is the
    # ratio weighting used here — jit-friendly, no host RNG)
    r_m = jnp.clip(num_h / num_m, 0.0, 1.0)
    r_l = jnp.clip(2.0 * num_h / num_l, 0.0, 1.0)
    weights = u_hmask + u_mmask * r_m + u_lmask * r_l
    loss = 0.5 * jnp.sum(((pred - gt) ** 2) * weights) / jnp.maximum(
        jnp.sum(weights), 1.0)
    return loss


def pem_cls_loss(pred_cls: jax.Array, gt_iou: jax.Array, bm_mask: jax.Array,
                 threshold: float = 0.9) -> jax.Array:
    pred = jnp.clip(pred_cls.astype(jnp.float32), 1e-6, 1 - 1e-6)
    pmask = ((gt_iou > threshold) * bm_mask).astype(jnp.float32)
    nmask = ((gt_iou <= threshold) * bm_mask).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pmask), 1.0)
    num_entries = num_pos + jnp.sum(nmask)
    ratio = jnp.clip(num_entries / num_pos, 1.05, 21.0)
    loss_pos = 0.5 * ratio * jnp.sum(jnp.log(pred) * pmask)
    coef_neg = 0.5 * ratio / (ratio - 1)
    loss_neg = coef_neg * jnp.sum(jnp.log(1.0 - pred) * nmask)
    return -(loss_pos + loss_neg) / num_entries


@LOSSES.register_module()
class BinaryLogisticRegressionLoss:
    """Registry wrapper over :func:`binary_logistic_loss` (reference
    ``binary_logistic_regression_loss.py:32`` — used standalone by TEM
    configs and internally by BMN)."""

    def __call__(self, reg_score: jax.Array, label: jax.Array,
                 threshold: float = 0.5) -> jax.Array:
        return binary_logistic_loss(reg_score, label, threshold)


@LOSSES.register_module()
class BMNLoss:
    """loss = tem + 10 * pem_reg + pem_cls (reference weighting)."""

    def __init__(self, tem_weight: float = 1.0, pem_reg_weight: float = 10.0,
                 pem_cls_weight: float = 1.0):
        self.w = (tem_weight, pem_reg_weight, pem_cls_weight)

    def __call__(self, outputs: Dict[str, jax.Array],
                 labels: Dict[str, jax.Array],
                 bm_mask: jax.Array) -> Dict[str, jax.Array]:
        conf = outputs["confidence_map"]
        l_tem = tem_loss(outputs["start"], outputs["end"],
                         labels["label_start"], labels["label_end"])
        l_reg = pem_reg_loss(conf[:, 0], labels["label_confidence"], bm_mask)
        l_cls = pem_cls_loss(conf[:, 1], labels["label_confidence"], bm_mask)
        total = self.w[0] * l_tem + self.w[1] * l_reg + self.w[2] * l_cls
        return {"loss": total, "tem_loss": l_tem, "pem_reg_loss": l_reg,
                "pem_cls_loss": l_cls}
