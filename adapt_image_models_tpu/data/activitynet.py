"""ActivityNet dataset for temporal localization
(reference ``mmaction/datasets/activitynet_dataset.py``, 269 LoC).

Annotation: a json of {video_id: {duration_second, annotations:
[{segment: [s, e], label}], feature_frame/duration_frame optional}}.
Features: per-video ``.npy`` (T, C) snippet features in ``data_prefix``.
``evaluate`` reports AR@AN + AUC from collected proposal arrays.
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Any, Dict, List, Sequence

import numpy as np

from adapt_image_models_tpu.data.datasets import DATASETS


@DATASETS.register_module()
class ActivityNetDataset:
    def __init__(self, ann_file: str, pipeline=None, data_prefix: str = "",
                 test_mode: bool = False, temporal_dim: int = 100):
        self.ann_file = ann_file
        self.pipeline = pipeline
        self.data_prefix = data_prefix
        self.test_mode = test_mode
        self.temporal_dim = temporal_dim
        with open(ann_file) as f:
            anno = json.load(f)
        self.video_infos = []
        for vid, info in anno.items():
            self.video_infos.append(dict(video_name=vid, **info))

    def __len__(self):
        return len(self.video_infos)

    def __getitem__(self, idx):
        return self.video_infos[idx]

    def load_feature(self, idx) -> np.ndarray:
        """(T, C) snippet features resized to temporal_dim by linear interp."""
        info = self.video_infos[idx]
        path = osp.join(self.data_prefix, info["video_name"] + ".npy")
        feat = np.load(path).astype(np.float32)
        t = self.temporal_dim
        if feat.shape[0] != t:
            src = np.linspace(0, feat.shape[0] - 1, t)
            lo = np.floor(src).astype(int)
            hi = np.minimum(lo + 1, feat.shape[0] - 1)
            w = (src - lo)[:, None]
            feat = feat[lo] * (1 - w) + feat[hi] * w
        return feat

    def gt_segments(self, idx) -> np.ndarray:
        """Relative [0,1] gt segments for one video."""
        info = self.video_infos[idx]
        dur = float(info.get("duration_second", 1.0)) or 1.0
        segs = [a["segment"] for a in info.get("annotations", [])]
        if not segs:
            return np.zeros((0, 2), np.float32)
        return np.clip(np.asarray(segs, np.float32) / dur, 0.0, 1.0)

    def evaluate(self, proposal_results: Dict[str, np.ndarray],
                 metrics: Sequence[str] = ("AR@AN",),
                 max_avg_proposals: int = 100) -> Dict[str, float]:
        """proposal_results: {video_name: (N, 3) [tmin, tmax, score]}."""
        from adapt_image_models_tpu.core.metrics import (
            average_recall_at_avg_proposals,
        )
        gt = {}
        total_props = 0
        for i, info in enumerate(self.video_infos):
            gt[info["video_name"]] = self.gt_segments(i)
            total_props += len(proposal_results.get(info["video_name"], ()))
        out: Dict[str, float] = {}
        for metric in metrics:
            if metric != "AR@AN":
                raise KeyError(f"unsupported metric {metric}")
            _, avg_recall, ppv, auc = average_recall_at_avg_proposals(
                gt, proposal_results, total_props,
                max_avg_proposals=max_avg_proposals)
            out["auc"] = float(auc)
            for an in (1, 5, 10, 100):
                idx = min(int(np.ceil(an / max_avg_proposals * 100)) - 1, 99)
                out[f"AR@{an}"] = float(avg_recall[idx])
        return out
