"""HVU multi-category tag dataset (reference
``mmaction/datasets/hvu_dataset.py:15``): json annotations with per-category
tag lists, multi-hot label/mask construction for HVULoss, and per-category
mAP evaluation.
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from adapt_image_models_tpu.data.datasets import DATASETS


@DATASETS.register_module()
class HVUDataset:
    def __init__(self, ann_file: str,
                 tag_categories: Sequence[str],
                 tag_category_nums: Sequence[int],
                 pipeline=None,
                 data_prefix: str = "",
                 test_mode: bool = False,
                 filename_tmpl: Optional[str] = None,
                 start_index: int = 0,
                 modality: str = "RGB"):
        assert len(tag_categories) == len(tag_category_nums)
        self.ann_file = ann_file
        self.pipeline = pipeline
        self.data_prefix = data_prefix or ""
        self.test_mode = test_mode
        self.tag_categories = list(tag_categories)
        self.tag_category_nums = list(tag_category_nums)
        self.filename_tmpl = filename_tmpl
        self.start_index = start_index
        self.modality = modality
        self.num_categories = len(tag_categories)
        self.num_tags = sum(tag_category_nums)
        self.category2num = dict(zip(tag_categories, tag_category_nums))
        starts = [0]
        for n in tag_category_nums[:-1]:
            starts.append(starts[-1] + n)
        self.category2startidx = dict(zip(tag_categories, starts))
        self.dataset_type: Optional[str] = None
        self.video_infos = self.load_annotations()

    def load_annotations(self) -> List[Dict[str, Any]]:
        assert self.ann_file.endswith(".json")
        with open(self.ann_file) as f:
            video_infos = json.load(f)
        info0 = video_infos[0]
        assert ("filename" in info0) != ("frame_dir" in info0)
        path_key = "filename" if "filename" in info0 else "frame_dir"
        self.dataset_type = "video" if path_key == "filename" else "rawframe"
        if self.dataset_type == "rawframe":
            assert self.filename_tmpl is not None
        for info in video_infos:
            if self.data_prefix:
                info[path_key] = osp.join(self.data_prefix, info[path_key])
            info["categories"] = self.tag_categories
            info["category_nums"] = self.tag_category_nums
            if self.dataset_type == "rawframe":
                info["filename_tmpl"] = self.filename_tmpl
                info["start_index"] = self.start_index
                info["modality"] = self.modality
            # multi-hot label + tag mask + category mask for HVULoss
            onehot = np.zeros(self.num_tags, np.float32)
            mask = np.zeros(self.num_tags, np.float32)
            category_mask = np.zeros(self.num_categories, np.float32)
            for ci, cat in enumerate(self.tag_categories):
                if cat not in info["label"]:
                    continue
                start = self.category2startidx[cat]
                num = self.category2num[cat]
                onehot[start + np.asarray(info["label"][cat], int)] = 1.0
                mask[start:start + num] = 1.0
                category_mask[ci] = 1.0
            info["label_onehot"] = onehot
            info["mask"] = mask
            info["category_mask"] = category_mask
        return video_infos

    def __len__(self) -> int:
        return len(self.video_infos)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.video_infos[idx]

    @staticmethod
    def label2array(num: int, label: Sequence[int]) -> np.ndarray:
        arr = np.zeros(num, np.float32)
        arr[np.asarray(label, int)] = 1.0
        return arr

    def evaluate(self, results: Sequence[np.ndarray],
                 metrics="mean_average_precision") -> Dict[str, float]:
        """Per-category mAP over the videos labeled for that category
        (reference ``hvu_dataset.py:128-196``)."""
        from adapt_image_models_tpu.core.metrics import mean_average_precision

        metrics = metrics if isinstance(metrics, (list, tuple)) else [metrics]
        assert list(metrics) == ["mean_average_precision"]
        if len(results) != len(self):
            raise ValueError(f"{len(results)} results vs {len(self)} samples")

        out: Dict[str, float] = {}
        gt_labels = [info["label"] for info in self.video_infos]
        for cat in self.tag_categories:
            start = self.category2startidx[cat]
            num = self.category2num[cat]
            preds = np.asarray([
                np.asarray(r)[start:start + num]
                for i, r in enumerate(results) if cat in gt_labels[i]])
            gts = np.asarray([
                self.label2array(num, gt[cat])
                for gt in gt_labels if cat in gt])
            if len(preds) == 0:
                continue
            out[f"{cat}_mAP"] = float(mean_average_precision(preds, gts))
        if out:
            out["overall_mAP"] = float(np.mean(list(out.values())))
        return out
