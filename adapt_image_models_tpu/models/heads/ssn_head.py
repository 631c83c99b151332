"""SSN classification head with structured temporal pyramid pooling
(reference ``mmaction/models/heads/ssn_head.py:27,124,272``).

Train path: STPP over each proposal's (start, course, end) stage features
-> activity / completeness / regression FCs. All segment counts are static
so the pyramid is plain reshapes and means — fully jittable.

Test path: the reference rebuilds a fused ``test_fc`` from trained weights
(``prepare_test_fc``, ``ssn_head.py:338``) to score every snippet once; here
the same reorganization is a single einsum against the completeness /
regression weights reshaped per STPP part — no weight surgery, numerically
identical. The per-proposal pyramid pooling of those dense scores is host
numpy (``stpp_test_pool``), as in the reference (it pools on CPU,
``ssn_head.py:215``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS

Dtype = jnp.dtype


def parse_stage_config(stage_cfg) -> Tuple[Tuple[int, ...], int]:
    """int | tuple -> (parts, total multiplier) (reference
    ``ssn_head.py:8-24``)."""
    if isinstance(stage_cfg, int):
        return (stage_cfg,), stage_cfg
    if isinstance(stage_cfg, (tuple, list)):
        return tuple(stage_cfg), sum(stage_cfg)
    raise ValueError(f"Incorrect STPP config {stage_cfg}")


def stpp_train_pool(x: jax.Array, scale_factors: jax.Array,
                    stpp_cfg: Sequence, num_segments_list: Sequence[int]
                    ) -> Tuple[jax.Array, jax.Array]:
    """(N * num_segments, C) stage features -> (activity_feat (N, C),
    stpp_feat (N, C * num_multipliers)) (reference ``ssn_head.py:82-121``).
    """
    stages = [parse_stage_config(c) for c in stpp_cfg]
    n0, n1, n2 = num_segments_list
    num_segments = n0 + n1 + n2
    c = x.shape[-1]
    x = x.reshape(-1, num_segments, c)
    n = x.shape[0]
    sf = scale_factors.reshape(n, 2)

    stage_feats = [x[:, :n0], x[:, n0:n0 + n1], x[:, n0 + n1:]]
    stage_scales = [sf[:, 0:1], None, sf[:, 1:2]]

    parts = []
    for (stage_parts, stage_mult), feat, scale in zip(stages, stage_feats,
                                                      stage_scales):
        slen = feat.shape[1]
        for num_parts in stage_parts:
            ticks = np.arange(0, slen + 1e-5, slen / num_parts).astype(int)
            for i in range(num_parts):
                # each part is divided by its STAGE's multiplier (reference
                # _extract_stage_feature, ssn_head.py:74-76 — NOT the
                # global part count)
                part = jnp.mean(feat[:, ticks[i]:ticks[i + 1]],
                                axis=1) / stage_mult
                if scale is not None:
                    part = part * scale
                parts.append(part)
    stpp_feat = jnp.concatenate(parts, axis=1)
    course_feat = jnp.mean(x[:, n0:n0 + n1], axis=1)
    return course_feat, stpp_feat


@HEADS.register_module()
class SSNHead(nn.Module):
    """(reference ``ssn_head.py:272-412``)."""

    dropout_ratio: float = 0.8
    in_channels: int = 1024
    num_classes: int = 20
    stpp_cfg: Sequence = (1, 1, 1)
    num_segments_list: Sequence[int] = (2, 5, 2)
    use_regression: bool = True
    init_std: float = 0.001
    compute_dtype: Dtype = jnp.float32

    @property
    def num_multipliers(self) -> int:
        return sum(parse_stage_config(c)[1] for c in self.stpp_cfg)

    def setup(self):
        init = nn.initializers.normal(self.init_std)
        self.activity_fc = nn.Dense(self.num_classes + 1, kernel_init=init,
                                    dtype=self.compute_dtype)
        self.completeness_fc = nn.Dense(self.num_classes, kernel_init=init,
                                        dtype=self.compute_dtype)
        if self.use_regression:
            self.regressor_fc = nn.Dense(self.num_classes * 2,
                                         kernel_init=init,
                                         dtype=self.compute_dtype)

    def __call__(self, x: jax.Array, proposal_scale_factor: jax.Array,
                 deterministic: bool = True):
        """Train path: x (N * num_segments, C) pooled backbone features."""
        activity_feat, stpp_feat = stpp_train_pool(
            x, proposal_scale_factor, self.stpp_cfg, self.num_segments_list)
        if self.dropout_ratio > 0 and not deterministic:
            activity_feat = nn.Dropout(self.dropout_ratio)(
                activity_feat, deterministic=False)
            stpp_feat = nn.Dropout(self.dropout_ratio)(
                stpp_feat, deterministic=False)
        activity_scores = self.activity_fc(activity_feat)
        # the completeness fc consumes the M concatenated part features;
        # splitting its kernel per part keeps one big matmul
        m = self.num_multipliers
        c = self.in_channels
        stpp_parts = stpp_feat.reshape(-1, m * c)
        complete_scores = self.completeness_fc(stpp_parts)
        bbox_preds = None
        if self.use_regression:
            bbox_preds = self.regressor_fc(stpp_parts)
            bbox_preds = bbox_preds.reshape(-1, self.num_classes, 2)
        return activity_scores, complete_scores, bbox_preds

    def dense_scores(self, x: jax.Array):
        """Test path, device part: per-snippet scores for every STPP part
        (the einsum equivalent of the reference's reorganized ``test_fc``).

        x: (S, C) snippet features -> activity (S, K+1),
        completeness (S, M, K), regression (S, M, 2K); completeness /
        regression biases are divided by M so summing parts reproduces the
        train-path fc exactly (reference ``ssn_head.py:359-378``).
        """
        m = self.num_multipliers
        c = self.in_channels
        act = self.activity_fc(x)
        wc = self.completeness_fc.variables["params"]["kernel"]
        bc = self.completeness_fc.variables["params"]["bias"]
        comp = jnp.einsum("sc,mck->smk", x, wc.reshape(m, c, -1)) + bc / m
        reg = None
        if self.use_regression:
            wr = self.regressor_fc.variables["params"]["kernel"]
            br = self.regressor_fc.variables["params"]["bias"]
            reg = jnp.einsum("sc,mck->smk", x, wr.reshape(m, c, -1)) + br / m
        return act, comp, reg


def stpp_test_pool(activity: np.ndarray, completeness: np.ndarray,
                   regression: Optional[np.ndarray],
                   proposal_ticks: np.ndarray, scale_factors: np.ndarray,
                   stpp_cfg: Sequence) -> Tuple[np.ndarray, np.ndarray,
                                                Optional[np.ndarray]]:
    """Pyramid-pool dense per-snippet scores over each proposal's ticks
    (reference ``STPPTest.forward``, ``ssn_head.py:220-269``).

    activity: (S, K+1); completeness/regression: (S, M, D);
    proposal_ticks: (P, 4) snippet indices [start0, start1, end1, end2];
    scale_factors: (P, 2).
    """
    stages = [parse_stage_config(c)[0] for c in stpp_cfg]
    p = len(proposal_ticks)
    out_act = np.zeros((p, activity.shape[1]), np.float32)
    out_comp = np.zeros((p, completeness.shape[2]), np.float32)
    out_reg = (np.zeros((p, regression.shape[2]), np.float32)
               if regression is not None else None)
    s_total = activity.shape[0]

    def pool(raw, ticks, sf):
        """raw: (S, M, D) -> (D,) summed over parts."""
        out = np.zeros(raw.shape[2], np.float32)
        offset = 0
        for stage_idx, stage_cfg in enumerate(stages):
            scale = (sf[0] if stage_idx == 0
                     else sf[1] if stage_idx == len(stages) - 1 else 1.0)
            tick_left = int(ticks[stage_idx])
            tick_right = float(max(ticks[stage_idx] + 1,
                                   ticks[stage_idx + 1]))
            if tick_right <= 0 or tick_left >= raw.shape[0]:
                offset += sum(stage_cfg)
                continue
            for num_parts in stage_cfg:
                part_ticks = np.arange(
                    tick_left, tick_right + 1e-5,
                    (tick_right - tick_left) / num_parts).astype(int)
                for i in range(num_parts):
                    lo, hi = part_ticks[i], part_ticks[i + 1]
                    if hi - lo >= 1:
                        out += raw[lo:hi, offset].mean(axis=0) * scale
                    offset += 1
        return out

    for i, ticks in enumerate(proposal_ticks):
        t1, t2 = int(ticks[1]), int(ticks[2])
        t1 = max(0, min(t1, s_total - 1))
        out_act[i] = activity[t1:max(t1 + 1, t2)].mean(axis=0)
        out_comp[i] = pool(completeness, ticks, scale_factors[i])
        if out_reg is not None:
            out_reg[i] = pool(regression, ticks, scale_factors[i])
    return out_act, out_comp, out_reg
