"""BSN — Boundary Sensitive Network: TEM (temporal evaluation) and PEM
(proposal evaluation) stages (reference ``mmaction/models/localizers/bsn.py:13,228``).

TPU shape: both are tiny dense nets, so the interesting parts are pure
functions — vectorized label generation (the reference loops per anchor per
gt, ``bsn.py:162-206``), a jittable class-balanced TEM loss, and PEM's
randomly-subsampled smooth-L1 driven by an explicit JAX PRNG key instead of
the reference's implicit ``torch.rand`` (``bsn.py:309-350``). The stage glue
(PGM candidate proposals + BSP features) lives in ``core/proposals.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import RECOGNIZERS
from adapt_image_models_tpu.models.losses.bmn_loss import binary_logistic_loss

Dtype = jnp.dtype


@RECOGNIZERS.register_module()
class TEM(nn.Module):
    """Snippet features (B, C, T) -> (B, 3, T) sigmoid scores
    (action, start, end) (reference ``bsn.py:105-117``)."""

    temporal_dim: int = 100
    boundary_ratio: float = 0.1
    tem_feat_dim: int = 400
    tem_hidden_dim: int = 512
    tem_match_threshold: float = 0.5
    loss_weight: float = 2.0
    output_dim: int = 3
    conv1_ratio: float = 1.0
    conv2_ratio: float = 1.0
    conv3_ratio: float = 0.01
    compute_dtype: Dtype = jnp.float32
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, raw_feature: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cdt = self.compute_dtype
        x = raw_feature.transpose(0, 2, 1).astype(cdt)  # (B, T, C)
        x = nn.relu(self.conv1_ratio * nn.Conv(
            self.tem_hidden_dim, (3,), padding=((1, 1),), dtype=cdt,
            name="conv1")(x))
        x = nn.relu(self.conv2_ratio * nn.Conv(
            self.tem_hidden_dim, (3,), padding=((1, 1),), dtype=cdt,
            name="conv2")(x))
        x = jax.nn.sigmoid(self.conv3_ratio * nn.Conv(
            self.output_dim, (1,), dtype=cdt, name="conv3")(x))
        return x.transpose(0, 2, 1).astype(jnp.float32)  # (B, 3, T)

    def loss(self, tem_output: jax.Array,
             labels: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Class-balanced logistic losses per score channel
        (reference ``bsn.py:119-138``)."""
        thr = self.tem_match_threshold
        return {
            "loss_action": self.loss_weight * binary_logistic_loss(
                tem_output[:, 0], labels["label_action"], thr),
            "loss_start": binary_logistic_loss(
                tem_output[:, 1], labels["label_start"], thr),
            "loss_end": binary_logistic_loss(
                tem_output[:, 2], labels["label_end"], thr),
        }

    def anchors(self) -> np.ndarray:
        """(T, 2) anchor [tmin, tmax] per snippet (reference ``bsn.py:83``)."""
        gap = 1.0 / self.temporal_dim
        i = np.arange(self.temporal_dim, dtype=np.float32)
        return np.stack([gap * i, gap * (i + 1)], axis=1)


def generate_tem_labels(gt_segments: np.ndarray, temporal_dim: int,
                        boundary_ratio: float) -> Dict[str, np.ndarray]:
    """Per-snippet match scores against action/start/end regions, vectorized
    over (anchor, gt) (reference ``bsn.py:162-206``). gt in relative [0,1].
    Returns three (T,) float arrays."""
    from adapt_image_models_tpu.core.proposals import temporal_iop

    t = temporal_dim
    gap = 1.0 / t
    i = np.arange(t, dtype=np.float64)
    a_min, a_max = (gap * i)[:, None], (gap * (i + 1))[:, None]  # (T, 1)

    gts = np.asarray(gt_segments, np.float64).reshape(-1, 2)
    if len(gts) == 0:
        z = np.zeros(t, np.float32)
        return {"label_action": z, "label_start": z.copy(),
                "label_end": z.copy()}
    tmins, tmaxs = gts[None, :, 0], gts[None, :, 1]  # (1, G)
    pad = np.maximum(gap, boundary_ratio * (tmaxs - tmins))

    action = temporal_iop(a_min, a_max, tmins, tmaxs).max(axis=1)
    start = temporal_iop(a_min, a_max, tmins - pad / 2,
                         tmins + pad / 2).max(axis=1)
    end = temporal_iop(a_min, a_max, tmaxs - pad / 2,
                       tmaxs + pad / 2).max(axis=1)
    return {"label_action": action.astype(np.float32),
            "label_start": start.astype(np.float32),
            "label_end": end.astype(np.float32)}


@RECOGNIZERS.register_module()
class PEM(nn.Module):
    """BSP features (N, feat_dim) -> (N,) proposal confidence
    (reference ``bsn.py:295-307``)."""

    pem_feat_dim: int = 32
    pem_hidden_dim: int = 256
    pem_u_ratio_m: float = 1.0
    pem_u_ratio_l: float = 2.0
    pem_high_temporal_iou_threshold: float = 0.6
    pem_low_temporal_iou_threshold: float = 0.2
    soft_nms_alpha: float = 0.75
    soft_nms_low_threshold: float = 0.65
    soft_nms_high_threshold: float = 0.9
    post_process_top_k: int = 100
    feature_extraction_interval: int = 16
    fc1_ratio: float = 0.1
    fc2_ratio: float = 0.1
    output_dim: int = 1
    compute_dtype: Dtype = jnp.float32
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, bsp_feature: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cdt = self.compute_dtype
        x = bsp_feature.astype(cdt)
        x = nn.relu(self.fc1_ratio * nn.Dense(self.pem_hidden_dim,
                                              name="fc1", dtype=cdt)(x))
        x = jax.nn.sigmoid(self.fc2_ratio * nn.Dense(self.output_dim,
                                                     name="fc2", dtype=cdt)(x))
        return x.reshape(-1).astype(jnp.float32)

    def loss(self, pred_iou: jax.Array, reference_iou: jax.Array,
             rng: jax.Array) -> Dict[str, jax.Array]:
        """Smooth-L1 over high-IoU proposals plus randomly subsampled
        medium/low bands (reference ``bsn.py:309-350``); ``rng`` replaces
        the reference's global torch RNG."""
        hi, lo = (self.pem_high_temporal_iou_threshold,
                  self.pem_low_temporal_iou_threshold)
        ref = reference_iou.astype(jnp.float32)
        u_h = (ref > hi).astype(jnp.float32)
        u_m = ((ref <= hi) & (ref > lo)).astype(jnp.float32)
        u_l = (ref <= lo).astype(jnp.float32)
        num_h = jnp.sum(u_h)

        k_m, k_l = jax.random.split(rng)
        r_m = jnp.minimum(self.pem_u_ratio_m * num_h
                          / jnp.maximum(jnp.sum(u_m), 1.0), 1.0)
        sm = (jax.random.uniform(k_m, ref.shape) * u_m > (1.0 - r_m))
        r_l = jnp.minimum(self.pem_u_ratio_l * num_h
                          / jnp.maximum(jnp.sum(u_l), 1.0), 1.0)
        sl = (jax.random.uniform(k_l, ref.shape) * u_l > (1.0 - r_l))

        weights = u_h + sm.astype(jnp.float32) + sl.astype(jnp.float32)
        diff = pred_iou.astype(jnp.float32) - ref
        absd = jnp.abs(diff)
        smooth_l1 = jnp.where(absd < 1.0, 0.5 * diff * diff, absd - 0.5)
        loss = jnp.sum(smooth_l1 * weights) / jnp.maximum(jnp.sum(weights), 1.0)
        return {"temporal_iou_loss": loss}

    def proposals_from_outputs(self, pem_scores: np.ndarray,
                               proposals: np.ndarray,
                               video_info: Dict) -> list:
        """PEM scores + PGM proposal rows -> final soft-NMS'd proposal list
        (reference ``bsn.py:352-378``)."""
        from adapt_image_models_tpu.core.proposals import post_processing

        p = np.asarray(proposals, np.float32)
        s = np.asarray(pem_scores, np.float32).reshape(-1)
        score = s * p[:, 2] * p[:, 3]
        result = np.stack([p[:, 0], p[:, 1], p[:, 2], p[:, 3], s, score],
                          axis=1)
        return post_processing(
            result, video_info, self.soft_nms_alpha,
            self.soft_nms_low_threshold, self.soft_nms_high_threshold,
            self.post_process_top_k, self.feature_extraction_interval)
