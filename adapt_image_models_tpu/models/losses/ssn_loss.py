"""SSN losses: OHEM hinge completeness loss + activity CE + class-wise
regression (reference ``mmaction/models/losses/ssn_loss.py:10`` and
``ohem_hinge_loss.py:4``).

The reference implements OHEM as a custom autograd.Function with a
hand-written backward that routes gradient only to the selected hard
examples; in JAX ``lax.top_k`` over the per-sample hinge losses gives the
identical gradient for free (d top_k-sum / d loss_i = 1 exactly on the
selected entries).

The reference gathers proposals with data-dependent ``nonzero`` indexers
(``ssn_loss.py:143-146``); that shape dynamism is hostile to XLA, but the
SSN sampler emits a FIXED per-video layout — ppv positives, then ipv
incompletes, then bpv backgrounds (``ssn_dataset.py:650-662``) — so here
every indexer is a static reshape+slice and the whole loss jits.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.builder import LOSSES


def sampler_layout(sampler: Dict) -> Tuple[int, int, int]:
    """(positives, incompletes, backgrounds) per video from the sampler cfg
    (reference ``ssn_loss.py:148-158``)."""
    total_ratio = (sampler["positive_ratio"] + sampler["background_ratio"]
                   + sampler["incomplete_ratio"])
    ppv = int(sampler["num_per_video"]
              * (sampler["positive_ratio"] / total_ratio))
    bpv = int(sampler["num_per_video"]
              * (sampler["background_ratio"] / total_ratio))
    ipv = sampler["num_per_video"] - ppv - bpv
    return ppv, ipv, bpv


def ohem_hinge_loss(pred: jax.Array, labels: jax.Array, is_positive: int,
                    ohem_ratio: float, group_size: int) -> jax.Array:
    """Sum of the top ``group_size * ohem_ratio`` class-wise hinge losses
    per group (reference ``ohem_hinge_loss.py:13-51``).

    pred: (N, K) scores; labels: (N,) 1-based class ids; N must be a
    multiple of ``group_size``."""
    cls_score = jnp.take_along_axis(
        pred.astype(jnp.float32), jnp.maximum(labels - 1, 0)[:, None],
        axis=1)[:, 0]
    losses = jnp.maximum(0.0, 1.0 - is_positive * cls_score)
    keep = max(1, int(group_size * ohem_ratio))
    grouped = losses.reshape(-1, group_size)
    top, _ = jax.lax.top_k(grouped, keep)
    return jnp.sum(top)


@LOSSES.register_module()
class SSNLoss:
    """activity CE + OHEM completeness + class-wise smooth-L1 regression
    (reference ``ssn_loss.py:115-179``). All inputs are laid out
    (B * num_per_video, ...) with the fixed ppv/ipv/bpv per-video order."""

    def __call__(self, activity_score: jax.Array,
                 completeness_score: jax.Array,
                 bbox_preds: Optional[jax.Array],
                 proposal_type: jax.Array, labels: jax.Array,
                 bbox_targets: Optional[jax.Array],
                 train_cfg: Dict) -> Dict[str, jax.Array]:
        sampler = train_cfg["ssn"]["sampler"]
        loss_weight = train_cfg["ssn"]["loss_weight"]
        ppv, ipv, bpv = sampler_layout(sampler)
        npv = ppv + ipv + bpv
        labels = labels.reshape(-1, npv)

        losses: Dict[str, jax.Array] = {}
        losses["loss_activity"] = self.activity_loss(
            activity_score.reshape(labels.shape[0], npv, -1), labels,
            ppv, ipv)
        losses["loss_completeness"] = (
            self.completeness_loss(
                completeness_score.reshape(labels.shape[0], npv, -1),
                labels, ppv, ipv, ohem_ratio=ppv / ipv)
            * loss_weight["comp_loss_weight"])
        if bbox_preds is not None:
            k2 = bbox_preds.shape[-2:]
            losses["loss_reg"] = (
                self.classwise_regression_loss(
                    bbox_preds.reshape(labels.shape[0], npv, *k2), labels,
                    bbox_targets.reshape(labels.shape[0], npv, 2), ppv)
                * loss_weight["reg_loss_weight"])
        return losses

    @staticmethod
    def activity_loss(activity_score, labels, ppv, ipv):
        """CE over positive + background proposals
        (reference indexer ``ssn_loss.py:143``)."""
        pred = jnp.concatenate(
            [activity_score[:, :ppv], activity_score[:, ppv + ipv:]], axis=1)
        gt = jnp.concatenate([labels[:, :ppv], labels[:, ppv + ipv:]], axis=1)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, gt[..., None], axis=2)[..., 0]
        return jnp.mean(nll)

    @staticmethod
    def completeness_loss(completeness_score, labels, positive_per_video,
                          incomplete_per_video, ohem_ratio=0.17):
        """Hinge(+1) on positives + OHEM hinge(-1) on incompletes
        (reference ``ssn_loss.py:30-79``)."""
        ppv, ipv = positive_per_video, incomplete_per_video
        k = completeness_score.shape[-1]
        pos_pred = completeness_score[:, :ppv].reshape(-1, k)
        inc_pred = completeness_score[:, ppv:ppv + ipv].reshape(-1, k)
        pos_loss = ohem_hinge_loss(
            pos_pred, labels[:, :ppv].reshape(-1), 1, 1.0, ppv)
        inc_loss = ohem_hinge_loss(
            inc_pred, labels[:, ppv:ppv + ipv].reshape(-1), -1, ohem_ratio,
            ipv)
        num_pos = pos_pred.shape[0]
        num_inc = int(inc_pred.shape[0] * ohem_ratio)
        return (pos_loss + inc_loss) / float(num_pos + num_inc)

    @staticmethod
    def classwise_regression_loss(bbox_pred, labels, bbox_targets, ppv):
        """Smooth-L1 on the gt-class row of positive proposals' (K, 2)
        regression output (reference ``ssn_loss.py:82-113``)."""
        pred = bbox_pred[:, :ppv].reshape(-1, *bbox_pred.shape[-2:])
        gt = labels[:, :ppv].reshape(-1)
        target = bbox_targets[:, :ppv].reshape(-1, 2)
        cls_pred = jnp.take_along_axis(
            pred, jnp.maximum(gt - 1, 0)[:, None, None].repeat(2, axis=2),
            axis=1)[:, 0]
        diff = cls_pred.astype(jnp.float32) - target.astype(jnp.float32)
        absd = jnp.abs(diff)
        sl1 = jnp.where(absd < 1.0, 0.5 * diff * diff, absd - 0.5)
        return jnp.mean(sl1) * 2.0
