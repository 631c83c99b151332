"""AVA spatio-temporal detection dataset
(reference ``mmaction/datasets/ava_dataset.py:18-382`` +
``pipelines/loading.py:443`` SampleAVAFrames).

Parses the official csv annotations / exclude file / pbtxt label map /
dense-proposal pickle, and prepares FIXED-SHAPE detection samples for the
jitted train step: frames (T, H, W, C) uint8, rois (R, 4) in final-image
pixels, multi-hot labels (R, C) and weights (R,) — the proposal-to-GT
assignment and pos/neg sampling run here on the host (``core/bbox.py``),
not per-step on the accelerator as in the reference's mmdet RoI head.

Box-aware pipeline ops supported (config types match the reference):
``SampleAVAFrames``, ``RawFrameDecode``, ``Resize``, ``RandomRescale``,
``RandomCrop``, ``Flip``, ``Normalize``/``FormatShape`` (device side).
"""

from __future__ import annotations

import os.path as osp
import pickle
from collections import defaultdict
from typing import Any, Dict, List, Optional

import numpy as np

from adapt_image_models_tpu.core.ava_eval import eval_frame_map, read_labelmap
from adapt_image_models_tpu.core.bbox import (
    assign_max_iou, bbox_target, random_sample,
)
from adapt_image_models_tpu.data.datasets import DATASETS
from adapt_image_models_tpu.data import transforms_host as TH


@DATASETS.register_module()
class AVADataset:
    _FPS = 30

    def __init__(self, ann_file: str, exclude_file: Optional[str],
                 pipeline: List[Dict[str, Any]],
                 label_file: Optional[str] = None,
                 filename_tmpl: str = "img_{:05}.jpg",
                 proposal_file: Optional[str] = None,
                 person_det_score_thr: float = 0.9,
                 num_classes: int = 81,
                 custom_classes: Optional[List[int]] = None,
                 data_prefix: Optional[str] = None,
                 test_mode: bool = False,
                 num_max_proposals: int = 1000,
                 timestamp_start: int = 900,
                 timestamp_end: int = 1800,
                 # fixed shapes for the jitted step
                 num_rois: int = 32,
                 # XLA needs static spatial dims: in test mode (short-side
                 # resize only, reference val pipeline has no crop) frames
                 # are zero-padded bottom/right onto this (H, W) canvas
                 test_pad_to: Optional[tuple] = None,
                 # rcnn train cfg (assigner/sampler), reference AVA defaults
                 assigner: Optional[Dict[str, Any]] = None,
                 sampler: Optional[Dict[str, Any]] = None,
                 pos_weight: float = 1.0,
                 modality: str = "RGB"):
        if not 0 <= person_det_score_thr <= 1:
            raise ValueError("person_det_score_thr must be in [0, 1]")
        self.ann_file = ann_file
        self.exclude_file = exclude_file
        self.pipeline = list(pipeline)
        self.label_file = label_file
        self.filename_tmpl = filename_tmpl
        self.proposal_file = proposal_file
        self.person_det_score_thr = person_det_score_thr
        self.num_classes = num_classes
        self.custom_classes = None
        if custom_classes is not None:
            if num_classes != len(custom_classes) + 1 or 0 in custom_classes:
                raise ValueError("num_classes must equal "
                                 "len(custom_classes)+1 and exclude 0")
            if label_file:
                with open(label_file) as f:
                    _, whitelist = read_labelmap(f)
                if not set(custom_classes).issubset(whitelist):
                    raise ValueError("custom_classes not in label map")
            self.custom_classes = [0] + list(custom_classes)
        self.data_prefix = data_prefix or ""
        self.test_mode = test_mode
        self.num_max_proposals = num_max_proposals
        self.timestamp_start = timestamp_start
        self.timestamp_end = timestamp_end
        self.num_rois = num_rois
        self.test_pad_to = tuple(test_pad_to) if test_pad_to else None
        self.assigner_cfg = dict(pos_iou_thr=0.9, neg_iou_thr=0.9,
                                 min_pos_iou=0.9)
        if assigner:
            self.assigner_cfg.update(
                {k: v for k, v in assigner.items() if k != "type"})
        self.sampler_cfg = dict(num=num_rois, pos_fraction=1.0,
                                neg_pos_ub=-1.0)
        if sampler:
            self.sampler_cfg.update(
                {k: v for k, v in sampler.items()
                 if k in ("num", "pos_fraction", "neg_pos_ub")})
        self.pos_weight = pos_weight

        self._parse_pipeline()
        self.video_infos = self.load_annotations()
        if self.proposal_file is not None:
            with open(self.proposal_file, "rb") as f:
                self.proposals = pickle.load(f)
        else:
            self.proposals = None
        if not test_mode and self.exclude_file:
            # official exclude CSVs zero-pad the timestamp ('vid,0904'):
            # normalize both sides to int (reference ava_dataset.py:209)
            excluded = set()
            for line in open(self.exclude_file):
                if line.strip():
                    vid, ts = line.strip().split(",")[:2]
                    excluded.add((vid, int(ts)))
            self.video_infos = [
                info for info in self.video_infos
                if (info["video_id"], int(info["timestamp"])) not in excluded]

    # ------------------------------------------------------------------
    def _parse_pipeline(self):
        self.clip_len, self.frame_interval = 4, 16
        self.resize_short: Optional[int] = None
        self.rescale_range = None
        self.crop_size: Optional[int] = None
        self.flip_ratio = 0.0
        self.mean = (123.675, 116.28, 103.53)
        self.std = (58.395, 57.12, 57.375)
        self.to_bgr = False
        for step in self.pipeline:
            t = step["type"]
            if t == "SampleAVAFrames":
                self.clip_len = step["clip_len"]
                self.frame_interval = step.get("frame_interval", 2)
            elif t == "Resize":
                scale = step.get("scale")
                if isinstance(scale, (tuple, list)) and scale[0] == -1:
                    self.resize_short = scale[1]
                else:
                    raise ValueError("AVA Resize supports (-1, short_side)")
            elif t == "RandomRescale":
                self.rescale_range = tuple(step["scale_range"])
            elif t == "RandomCrop":
                self.crop_size = step["size"]
            elif t == "Flip":
                self.flip_ratio = step.get("flip_ratio", 0.5)
            elif t == "Normalize":
                self.mean = tuple(step.get("mean", self.mean))
                self.std = tuple(step.get("std", self.std))
                self.to_bgr = step.get("to_bgr", False)
            elif t in ("RawFrameDecode", "FormatShape", "Collect", "ToTensor",
                       "Rename", "ToDataContainer",
                       # box-aware geometry is applied unconditionally in
                       # prepare_sample (the gt/proposal scale/shift/flip
                       # math) — the reference's explicit EntityBox* steps
                       # (augmentations.py Flip/RandomCrop branches in old
                       # mmaction2 recipes) are subsumed, accepted as no-ops
                       "EntityBoxRescale", "EntityBoxCrop", "EntityBoxFlip",
                       "EntityBoxClip", "EntityBoxPad",
                       "DecordInit", "DecordDecode"):
                continue
            else:
                raise KeyError(f"unsupported AVA pipeline step {t}")

    def output_size(self):
        if self.crop_size:
            return (self.crop_size, self.crop_size)
        return None  # short-side resize keeps aspect; loader pads per-batch

    # ------------------------------------------------------------------
    def load_annotations(self):
        records = defaultdict(list)
        with open(self.ann_file) as f:
            for line in f:
                parts = line.strip().split(",")
                if len(parts) < 7:
                    continue
                label = int(parts[6])
                if self.custom_classes is not None:
                    if label not in self.custom_classes:
                        continue
                    label = self.custom_classes.index(label)
                entity_id = int(parts[7]) if len(parts) > 7 else 0
                records[f"{parts[0]},{int(parts[1]):04d}"].append(dict(
                    video_id=parts[0], timestamp=int(parts[1]),
                    box=np.array(list(map(float, parts[2:6])), np.float32),
                    label=label, entity_id=entity_id))

        infos = []
        for img_key, recs in sorted(records.items()):
            # merge records of the same entity box into one multi-hot label
            # (reference parse_img_record, ava_dataset.py:152-195)
            by_box: Dict[bytes, Dict[str, Any]] = {}
            order = []
            for r in recs:
                k = r["box"].tobytes()
                if k not in by_box:
                    by_box[k] = dict(box=r["box"],
                                     label=np.zeros(self.num_classes,
                                                    np.float32),
                                     entity_id=r["entity_id"])
                    order.append(k)
                by_box[k]["label"][r["label"]] = 1.0
            video_id, timestamp = img_key.split(",")
            shot = (0, (self.timestamp_end - self.timestamp_start) * self._FPS)
            infos.append(dict(
                video_id=video_id, timestamp=int(timestamp), img_key=img_key,
                frame_dir=osp.join(self.data_prefix, video_id),
                shot_info=shot, fps=self._FPS,
                gt_bboxes=np.stack([by_box[k]["box"] for k in order]),
                gt_labels=np.stack([by_box[k]["label"] for k in order]),
                entity_ids=np.asarray([by_box[k]["entity_id"]
                                       for k in order])))
        return infos

    def __len__(self):
        return len(self.video_infos)

    def __getitem__(self, idx):
        return self.video_infos[idx]

    # ------------------------------------------------------------------
    def _sample_frames(self, info, rng) -> np.ndarray:
        """SampleAVAFrames (reference loading.py:443-478): a clip centered
        on the keyframe, with per-frame jitter at train time."""
        center = info["fps"] * (info["timestamp"]
                                - self.timestamp_start) + 1
        start = center - (self.clip_len // 2) * self.frame_interval
        end = center + ((self.clip_len + 1) // 2) * self.frame_interval
        inds = np.arange(start, end, self.frame_interval)
        if not self.test_mode:
            inds = inds + rng.integers(-(self.frame_interval // 2),
                                       (self.frame_interval + 1) // 2,
                                       size=self.clip_len)
        lo, hi = info["shot_info"]
        return np.clip(inds, lo, hi - 1).astype(np.int64)

    def _decode(self, info, inds) -> np.ndarray:
        from adapt_image_models_tpu.data.video_reader import RawFrameReader
        reader = RawFrameReader(info["frame_dir"], int(info["shot_info"][1]),
                                filename_tmpl=self.filename_tmpl,
                                start_index=1)
        try:
            return reader.get_frames(inds)
        finally:
            reader.close()

    def _proposals_for(self, img_key) -> np.ndarray:
        if self.proposals is None:
            return np.zeros((0, 5), np.float32)
        props = np.asarray(self.proposals.get(img_key,
                                              np.zeros((0, 5), np.float32)),
                           np.float32)
        if props.shape[-1] == 4:
            props = np.concatenate(
                [props, np.ones((len(props), 1), np.float32)], -1)
        keep = props[:, 4] >= self.person_det_score_thr
        if not keep.any() and len(props):
            keep = props[:, 4] == props[:, 4].max()
        props = props[keep][:self.num_max_proposals]
        return props

    def prepare_sample(self, idx: int, rng: np.random.Generator
                       ) -> Dict[str, Any]:
        info = self.video_infos[idx]
        inds = self._sample_frames(info, rng)
        frames = self._decode(info, inds)  # (T, H0, W0, C)
        h0, w0 = frames.shape[1:3]

        # boxes in pixel space of the current image
        gt = info["gt_bboxes"] * np.array([w0, h0, w0, h0], np.float32)
        props = self._proposals_for(info["img_key"])
        prop_boxes = props[:, :4] * np.array([w0, h0, w0, h0], np.float32)

        # geometry (box-aware)
        if self.rescale_range and not self.test_mode:
            short = int(rng.integers(self.rescale_range[0],
                                     self.rescale_range[1] + 1))
        else:
            short = self.resize_short
        if short:
            scale = short / min(h0, w0)
            new_h, new_w = int(round(h0 * scale)), int(round(w0 * scale))
            frames = TH.resize_clip(frames, (new_w, new_h))
            gt = gt * scale
            prop_boxes = prop_boxes * scale
        h, w = frames.shape[1:3]
        if self.crop_size and not self.test_mode:
            c = self.crop_size
            y0 = int(rng.integers(0, max(1, h - c + 1)))
            x0 = int(rng.integers(0, max(1, w - c + 1)))
            frames = frames[:, y0:y0 + c, x0:x0 + c]
            shift = np.array([x0, y0, x0, y0], np.float32)
            gt = np.clip(gt - shift, 0, [c, c, c, c])
            prop_boxes = np.clip(prop_boxes - shift, 0, [c, c, c, c])
            h = w = c
        elif self.crop_size:
            c = self.crop_size
            y0, x0 = (h - c) // 2, (w - c) // 2
            frames = frames[:, y0:y0 + c, x0:x0 + c]
            shift = np.array([x0, y0, x0, y0], np.float32)
            gt = np.clip(gt - shift, 0, [c, c, c, c])
            prop_boxes = np.clip(prop_boxes - shift, 0, [c, c, c, c])
            h = w = c
        if self.flip_ratio and not self.test_mode and rng.random() < self.flip_ratio:
            frames = frames[:, :, ::-1]
            for boxes in (gt, prop_boxes):
                x1 = boxes[:, 0].copy()
                boxes[:, 0] = w - boxes[:, 2]
                boxes[:, 2] = w - x1
        if self.test_mode and self.test_pad_to:
            ph, pw = self.test_pad_to
            if h > ph or w > pw:
                raise ValueError(f"frame {h}x{w} exceeds test_pad_to "
                                 f"{self.test_pad_to}")
            canvas = np.zeros((frames.shape[0], ph, pw, 3), frames.dtype)
            canvas[:, :h, :w] = frames
            frames = canvas  # boxes unchanged (pad is bottom/right)
        if self.to_bgr:
            frames = frames[..., ::-1]
        frames = np.ascontiguousarray(frames)

        out = {"imgs": frames, "img_key": info["img_key"],
               "img_shape": np.array([h, w], np.int32)}
        if self.test_mode:
            rois = np.zeros((self.num_rois, 4), np.float32)
            weights = np.zeros((self.num_rois,), np.float32)
            take = min(len(prop_boxes), self.num_rois)
            rois[:take] = prop_boxes[:take]
            weights[:take] = 1.0
            out.update(rois=rois, roi_weights=weights)
        else:
            assign = assign_max_iou(prop_boxes, gt, info["gt_labels"],
                                    **self.assigner_cfg)
            # the reference's sampler uses add_gt_as_proposals=True
            gt_assign = assign_max_iou(gt, gt, info["gt_labels"],
                                       **self.assigner_cfg)
            merged_props = np.concatenate([gt, prop_boxes], axis=0)
            merged_gt_inds = np.concatenate([gt_assign.gt_inds,
                                             assign.gt_inds])
            merged_labels = (np.concatenate([gt_assign.labels, assign.labels])
                             if assign.labels is not None else None)
            merged = assign.__class__(assign.num_gts, merged_gt_inds,
                                      np.zeros(len(merged_props)),
                                      merged_labels)
            sampling = random_sample(merged, merged_props, rng=rng,
                                     **self.sampler_cfg)
            rois, labels, weights = bbox_target(
                sampling, self.num_classes, self.num_rois, self.pos_weight)
            out.update(rois=rois, labels=labels, roi_weights=weights)
        return out

    # ------------------------------------------------------------------
    def evaluate(self, results: List[Dict[str, np.ndarray]],
                 metrics=("mAP",), iou_thr: float = 0.5,
                 **kw) -> Dict[str, float]:
        """results: per-sample dicts with 'img_key', 'boxes' (R, 4) pixels,
        'scores' (R, num_classes) sigmoid, 'mask' (R,), 'img_shape'."""
        detections = {}
        gts = {}
        key_to_info = {info["img_key"]: info for info in self.video_infos}
        for res in results:
            key = res["img_key"]
            m = res["mask"] > 0
            hh, ww = res["img_shape"]
            norm = np.array([ww, hh, ww, hh], np.float32)
            detections[key] = (res["boxes"][m] / norm, res["scores"][m])
            info = key_to_info[key]
            gts[key] = (info["gt_bboxes"], info["gt_labels"])
        out = eval_frame_map(detections, gts, self.num_classes,
                             iou_thr=iou_thr)
        return out
