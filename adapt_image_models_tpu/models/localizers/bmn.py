"""BMN — Boundary-Matching Network for temporal action proposal generation
(reference ``mmaction/models/localizers/bmn.py:14-416``).

Structure: shared 1D conv base over snippet features -> start/end boundary
probability branches -> proposal branch whose features are sampled for every
(start, duration) candidate through the boundary-matching interpolation mask
(one big matmul — MXU-friendly by construction) -> 3D+2D conv stack -> a
(2, T, T) confidence map (regression + classification channels).

Train-time label generation (``generate_bmn_labels``) and soft-NMS
post-processing (``soft_nms``) are pure functions.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import RECOGNIZERS

Dtype = jnp.dtype


def _interp1d_mask(tscale: int, num_samples: int, num_samples_per_bin: int,
                   boundary_ratio: float) -> np.ndarray:
    """Boundary-matching sampling mask (reference ``bmn.py:_get_interp1d_mask``):
    (T, num_samples, T_duration, T_start) bilinear sampling weights."""

    def bin_weights(seg_tmin, seg_tmax):
        plen = float(seg_tmax - seg_tmin)
        sample_each = num_samples * num_samples_per_bin
        plen_sample = plen / (sample_each - 1.0)
        samples = [seg_tmin + plen_sample * i for i in range(sample_each)]
        out = np.zeros((tscale, num_samples), np.float32)
        for i in range(num_samples):
            pts = samples[i * num_samples_per_bin:(i + 1) * num_samples_per_bin]
            for p in pts:
                p = p * tscale  # to index space
                lo = int(math.floor(p))
                w_hi = p - lo
                if 0 <= lo < tscale:
                    out[lo, i] += (1.0 - w_hi) / num_samples_per_bin
                if 0 <= lo + 1 < tscale:
                    out[lo + 1, i] += w_hi / num_samples_per_bin
        return out

    gap = 1.0 / tscale
    mask = np.zeros((tscale, num_samples, tscale, tscale), np.float32)
    for start_idx in range(tscale):
        for dur_idx in range(tscale):
            if start_idx + dur_idx < tscale:
                p_tmin = start_idx * gap
                p_tmax = (start_idx + dur_idx + 1) * gap
                center_len = p_tmax - p_tmin
                seg_tmin = p_tmin - center_len * boundary_ratio
                seg_tmax = p_tmax + center_len * boundary_ratio
                mask[:, :, dur_idx, start_idx] = bin_weights(seg_tmin, seg_tmax)
    return mask


def _bm_valid_mask(tscale: int) -> np.ndarray:
    """Upper-left validity mask over (duration, start) (``_get_bm_mask``)."""
    m = np.zeros((tscale, tscale), np.float32)
    for d in range(tscale):
        m[d, :tscale - d] = 1.0
    return m


def _conv1d(x, ch, k, groups=1, name=None, dtype=jnp.float32):
    pad = k // 2
    return nn.Conv(ch, (k,), padding=((pad, pad),),
                   feature_group_count=groups, dtype=dtype, name=name)(x)


@RECOGNIZERS.register_module()
class BMN(nn.Module):
    """Input snippet features (B, feat_dim, T) -> dict of
    confidence_map (B, 2, T, T), start (B, T), end (B, T)."""

    temporal_dim: int = 100
    boundary_ratio: float = 0.5
    num_samples: int = 32
    num_samples_per_bin: int = 3
    feat_dim: int = 400
    hidden_dim_1d: int = 256
    hidden_dim_2d: int = 128
    hidden_dim_3d: int = 512
    soft_nms_alpha: float = 0.4
    soft_nms_low_threshold: float = 0.5
    soft_nms_high_threshold: float = 0.9
    post_process_top_k: int = 100
    compute_dtype: Dtype = jnp.float32
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, raw_feature: jax.Array,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        cdt = self.compute_dtype
        t = self.temporal_dim
        x = raw_feature.transpose(0, 2, 1).astype(cdt)  # (B, T, C)

        # base (x_1d_b): two grouped conv1d + relu
        h = nn.relu(_conv1d(x, self.hidden_dim_1d, 3, groups=4,
                            name="base_conv1", dtype=cdt))
        base = nn.relu(_conv1d(h, self.hidden_dim_1d, 3, groups=4,
                               name="base_conv2", dtype=cdt))

        # temporal evaluation branches (x_1d_s / x_1d_e)
        s = nn.relu(_conv1d(base, self.hidden_dim_1d, 3, groups=4,
                            name="start_conv1", dtype=cdt))
        start = jax.nn.sigmoid(_conv1d(s, 1, 1, name="start_conv2",
                                       dtype=cdt))[..., 0]
        e = nn.relu(_conv1d(base, self.hidden_dim_1d, 3, groups=4,
                            name="end_conv1", dtype=cdt))
        end = jax.nn.sigmoid(_conv1d(e, 1, 1, name="end_conv2",
                                     dtype=cdt))[..., 0]

        # proposal branch: x_1d_p -> BM sampling -> x_3d_p -> x_2d_p
        p = nn.relu(_conv1d(base, self.hidden_dim_1d, 3, name="p_conv1",
                            dtype=cdt))  # (B, T, C)
        mask = jnp.asarray(
            _interp1d_mask(t, self.num_samples, self.num_samples_per_bin,
                           self.boundary_ratio).reshape(t, -1), cdt)
        # (B, C, T) @ (T, S*T*T) -> (B, C, S, T, T)
        bm = jnp.einsum("btc,ts->bcs", p, mask, preferred_element_type=jnp.float32)
        bm = bm.astype(cdt).reshape(p.shape[0], self.hidden_dim_1d,
                                    self.num_samples, t, t)

        # 3D conv over the sample axis (kernel = num_samples)
        bm = bm.transpose(0, 2, 3, 4, 1)  # (B, S, T, T, C)
        bm = nn.Conv(self.hidden_dim_3d, (self.num_samples, 1, 1),
                     strides=(self.num_samples, 1, 1), padding="VALID",
                     dtype=cdt, name="p_conv3d")(bm)
        bm = nn.relu(bm)[:, 0]  # (B, T, T, C3)

        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (1, 1), dtype=cdt,
                             name="p_conv2d_1")(bm))
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (3, 3), padding="SAME",
                             dtype=cdt, name="p_conv2d_2")(bm))
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (3, 3), padding="SAME",
                             dtype=cdt, name="p_conv2d_3")(bm))
        conf = jax.nn.sigmoid(nn.Conv(2, (1, 1), dtype=cdt,
                                      name="p_conv2d_4")(bm))
        conf = conf.transpose(0, 3, 1, 2)  # (B, 2, T, T) over (duration, start)
        return {"confidence_map": conf.astype(jnp.float32),
                "start": start.astype(jnp.float32),
                "end": end.astype(jnp.float32)}

    # ------------------------------------------------------------------
    def proposals_from_outputs(self, outputs: Dict[str, np.ndarray],
                               video_meta: Optional[Dict] = None) -> np.ndarray:
        """Decode + score proposals for ONE video, soft-NMS, top-k
        (reference ``bmn.py`` forward_test post-processing).
        Returns (N, 3): tmin, tmax, score (relative [0,1] times)."""
        t = self.temporal_dim
        conf = np.asarray(outputs["confidence_map"])
        start = np.asarray(outputs["start"])
        end = np.asarray(outputs["end"])
        reg_conf, cls_conf = conf[0], conf[1]
        valid = _bm_valid_mask(t)

        props = []
        for dur in range(t):
            for st in range(t):
                if valid[dur, st] == 0:
                    continue
                tmin = st / t
                tmax = (st + dur + 1) / t
                score = (start[st] * end[min(st + dur + 1, t - 1)]
                         * reg_conf[dur, st] * cls_conf[dur, st])
                props.append((tmin, tmax, float(score)))
        props = np.asarray(props, np.float32)
        props = props[np.argsort(-props[:, 2])]
        props = soft_nms(props, self.soft_nms_alpha,
                         self.soft_nms_low_threshold,
                         self.soft_nms_high_threshold,
                         self.post_process_top_k)
        return props[:self.post_process_top_k]


def temporal_iou(a_min, a_max, b_min, b_max):
    inter = np.maximum(0.0, np.minimum(a_max, b_max) - np.maximum(a_min, b_min))
    union = (a_max - a_min) + (b_max - b_min) - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)


def soft_nms(proposals: np.ndarray, alpha: float, low_threshold: float,
             high_threshold: float, top_k: int) -> np.ndarray:
    """Gaussian soft-NMS (reference ``localization/proposal_utils.py``).
    proposals: (N, 3) [tmin, tmax, score], score-descending."""
    props = proposals.copy()
    keep: List[np.ndarray] = []
    while len(props) > 0 and len(keep) < top_k:
        best = props[0]
        keep.append(best)
        props = props[1:]
        if len(props) == 0:
            break
        ious = temporal_iou(best[0], best[1], props[:, 0], props[:, 1])
        decay = np.where(ious > low_threshold,
                         np.exp(-(ious ** 2) / alpha), 1.0)
        props[:, 2] *= decay
        props = props[np.argsort(-props[:, 2])]
    return np.asarray(keep, np.float32)


def generate_bmn_labels(gt_segments: Sequence[Tuple[float, float]],
                        tscale: int,
                        max_iou_threshold: float = 0.9) -> Dict[str, np.ndarray]:
    """Training targets (reference ``bmn.py generate_labels``):
    label_confidence (T, T) max tIoU per (duration, start) anchor;
    label_start/label_end (T,) boundary indicators. gt in relative [0,1]."""
    gap = 1.0 / tscale
    gts = np.asarray(gt_segments, np.float32).reshape(-1, 2)

    conf = np.zeros((tscale, tscale), np.float32)
    for dur in range(tscale):
        for st in range(tscale):
            if st + dur < tscale:
                tmin = st * gap
                tmax = (st + dur + 1) * gap
                if len(gts):
                    conf[dur, st] = temporal_iou(
                        tmin, tmax, gts[:, 0], gts[:, 1]).max()

    starts = np.zeros(tscale, np.float32)
    ends = np.zeros(tscale, np.float32)
    if len(gts):
        dur_b = 3.0 / tscale / 2
        centers = (np.arange(tscale) + 0.5) * gap
        for g0, g1 in gts:
            # ioa of each snippet window with the boundary region
            for arr, b in ((starts, g0), (ends, g1)):
                lo, hi = b - dur_b, b + dur_b
                inter = np.maximum(0, np.minimum(centers + gap / 2, hi)
                                   - np.maximum(centers - gap / 2, lo))
                ioa = inter / gap
                np.maximum(arr, ioa, out=arr)
    return {"label_confidence": conf, "label_start": starts,
            "label_end": ends}
