"""Host-side bbox utilities for the AVA detection path.

TPU-first split of the reference design: proposal-to-GT assignment and
pos/neg sampling are data-dependent, ragged computations, so they run in
numpy inside the data pipeline (the reference runs them per-step on GPU via
mmdet's ``MaxIoUAssignerAVA``/``RandomSampler``,
``/root/reference/mmaction/core/bbox/assigners/max_iou_assigner_ava.py:15``).
The jitted train step then sees only fixed-shape ``(num_rois, 4)`` boxes,
``(num_rois, num_classes)`` multi-hot labels and ``(num_rois,)`` weights —
zero-weight rows pad short samples, so XLA shapes are static.

``bbox_target`` parity: positive rows keep their multi-hot GT labels with
``pos_weight``; negative rows get zero labels with weight 1
(``/root/reference/mmaction/core/bbox/bbox_target.py:5-41``).
``bbox2result`` parity: per-class (n, 5) arrays thresholded on scores
(``/root/reference/mmaction/core/bbox/transforms.py:4-37``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def bbox_overlaps(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU. boxes: (n, 4) / (m, 4) in x1,y1,x2,y2 -> (n, m)."""
    boxes1 = np.asarray(boxes1, np.float64).reshape(-1, 4)
    boxes2 = np.asarray(boxes2, np.float64).reshape(-1, 4)
    area1 = np.clip(boxes1[:, 2] - boxes1[:, 0], 0, None) * \
        np.clip(boxes1[:, 3] - boxes1[:, 1], 0, None)
    area2 = np.clip(boxes2[:, 2] - boxes2[:, 0], 0, None) * \
        np.clip(boxes2[:, 3] - boxes2[:, 1], 0, None)
    lt = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = np.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)


@dataclass
class AssignResult:
    num_gts: int
    gt_inds: np.ndarray      # (n,) -1 ignore / 0 negative / i+1 positive
    max_overlaps: np.ndarray  # (n,)
    labels: Optional[np.ndarray]  # (n, num_classes) multi-hot or None


def assign_max_iou(proposals: np.ndarray, gt_bboxes: np.ndarray,
                   gt_labels: Optional[np.ndarray] = None,
                   pos_iou_thr: float = 0.9, neg_iou_thr: float = 0.9,
                   min_pos_iou: float = 0.9,
                   gt_max_assign_all: bool = True) -> AssignResult:
    """MaxIoUAssignerAVA semantics (multi-hot labels allowed).

    Reference ``max_iou_assigner_ava.py:39-130``: -1 by default; negative if
    max IoU in [0, neg_iou_thr); positive (gt index + 1) if >= pos_iou_thr;
    each gt claims its best proposal if that IoU >= min_pos_iou.
    """
    n = len(proposals)
    k = len(gt_bboxes)
    gt_inds = np.full((n,), -1, np.int64)
    if k == 0 or n == 0:
        if k == 0:
            gt_inds[:] = 0
        labels = (np.zeros((n, gt_labels.shape[1]), np.float32)
                  if gt_labels is not None else None)
        return AssignResult(k, gt_inds, np.zeros((n,), np.float64), labels)

    overlaps = bbox_overlaps(gt_bboxes, proposals)  # (k, n)
    max_overlaps = overlaps.max(axis=0)
    argmax_overlaps = overlaps.argmax(axis=0)

    # negatives
    gt_inds[(max_overlaps >= 0) & (max_overlaps < neg_iou_thr)] = 0
    # positives
    pos = max_overlaps >= pos_iou_thr
    gt_inds[pos] = argmax_overlaps[pos] + 1
    # each gt claims its best proposal
    gt_max = overlaps.max(axis=1)
    for i in range(k):
        if gt_max[i] >= min_pos_iou:
            if gt_max_assign_all:
                claim = overlaps[i] == gt_max[i]
                gt_inds[claim] = i + 1
            else:
                gt_inds[overlaps[i].argmax()] = i + 1

    labels = None
    if gt_labels is not None:
        labels = np.zeros((n, gt_labels.shape[1]), np.float32)
        fg = gt_inds > 0
        labels[fg] = gt_labels[gt_inds[fg] - 1]
    return AssignResult(k, gt_inds, max_overlaps, labels)


@dataclass
class SamplingResult:
    pos_inds: np.ndarray
    neg_inds: np.ndarray
    pos_bboxes: np.ndarray
    neg_bboxes: np.ndarray
    pos_gt_labels: Optional[np.ndarray]


def random_sample(assign: AssignResult, proposals: np.ndarray,
                  num: int = 32, pos_fraction: float = 1.0,
                  neg_pos_ub: float = -1.0,
                  rng: Optional[np.random.Generator] = None) -> SamplingResult:
    """mmdet RandomSampler semantics (the AVA configs use
    ``num=32, pos_fraction=1, neg_pos_ub=-1`` — all positives, no forced
    negatives)."""
    rng = rng or np.random.default_rng()
    pos_inds = np.flatnonzero(assign.gt_inds > 0)
    neg_inds = np.flatnonzero(assign.gt_inds == 0)
    num_pos = min(int(num * pos_fraction), len(pos_inds))
    if len(pos_inds) > num_pos:
        pos_inds = rng.choice(pos_inds, num_pos, replace=False)
    num_neg = num - len(pos_inds)
    if neg_pos_ub >= 0:
        num_neg = min(num_neg, int(neg_pos_ub * max(1, len(pos_inds))))
    num_neg = min(num_neg, len(neg_inds))
    if len(neg_inds) > num_neg:
        neg_inds = rng.choice(neg_inds, num_neg, replace=False)
    labels = (assign.labels[pos_inds] if assign.labels is not None else None)
    return SamplingResult(pos_inds, neg_inds, proposals[pos_inds],
                          proposals[neg_inds], labels)


def bbox_target(sampling: SamplingResult, num_classes: int, num_rois: int,
                pos_weight: float = 1.0
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fixed-shape rois/labels/weights for the jitted step.

    Rows: positives (gt multi-hot, ``pos_weight``) then negatives (zero
    labels, weight 1), zero-padded to ``num_rois`` with weight 0.
    """
    rois = np.zeros((num_rois, 4), np.float32)
    labels = np.zeros((num_rois, num_classes), np.float32)
    weights = np.zeros((num_rois,), np.float32)
    np_pos = len(sampling.pos_bboxes)
    np_neg = len(sampling.neg_bboxes)
    take_pos = min(np_pos, num_rois)
    rois[:take_pos] = sampling.pos_bboxes[:take_pos]
    if sampling.pos_gt_labels is not None:
        labels[:take_pos] = sampling.pos_gt_labels[:take_pos]
    weights[:take_pos] = pos_weight if pos_weight > 0 else 1.0
    take_neg = min(np_neg, num_rois - take_pos)
    rois[take_pos:take_pos + take_neg] = sampling.neg_bboxes[:take_neg]
    weights[take_pos:take_pos + take_neg] = 1.0
    return rois, labels, weights


def bbox2result(bboxes: np.ndarray, scores: np.ndarray, num_classes: int,
                thr: float = 0.01):
    """Per-class (n, 5) [x1 y1 x2 y2 score] lists (transforms.py:4-37);
    class 0 is the reserved background/person slot."""
    if len(bboxes) == 0:
        return [np.zeros((0, 5), np.float32) for _ in range(num_classes - 1)]
    result = []
    for i in range(num_classes - 1):
        where = scores[:, i + 1] > thr
        result.append(np.concatenate(
            [bboxes[where, :4], scores[where, i + 1:i + 2]],
            axis=1).astype(np.float32))
    return result
