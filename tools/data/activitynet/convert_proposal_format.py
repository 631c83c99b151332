#!/usr/bin/env python
"""Convert BSN/BMN proposal output json into the SSN-style formatted
proposal file (reference
``tools/data/activitynet/convert_proposal_format.py``)."""

import argparse
import json

import numpy as np


def pairwise_temporal_iou(proposals: np.ndarray, gts: np.ndarray):
    """(n_gt, n_prop) tIoU and overlap_self = intersection / proposal_len
    (reference ``mmaction/localization/proposal_utils.py``)."""
    p_start, p_end = proposals[:, 0][None, :], proposals[:, 1][None, :]
    g_start, g_end = gts[:, 0][:, None], gts[:, 1][:, None]
    inter = np.clip(np.minimum(p_end, g_end) - np.maximum(p_start, g_start),
                    0, None)
    union = np.maximum(p_end, g_end) - np.minimum(p_start, g_start)
    tiou = inter / np.maximum(union, 1e-10)
    overlap_self = inter / np.maximum(p_end - p_start, 1e-10)
    return tiou, overlap_self


def dump_formatted_proposal(video_idx, video_id, num_frames, fps, gts,
                            proposals, tiou, t_overlap_self, out):
    out.write(f"#{video_idx}\n{video_id}\n{num_frames}\n{fps}\n"
              f"{gts.shape[0]}\n")
    for gt in gts:
        out.write(f"{int(gt[2])} {gt[0]} {gt[1]}\n")
    out.write(f"{proposals.shape[0]}\n")
    best_iou = np.amax(tiou, axis=0)
    best_iou_index = np.argmax(tiou, axis=0)
    best_overlap = np.amax(t_overlap_self, axis=0)
    best_overlap_index = np.argmax(t_overlap_self, axis=0)
    for i in range(proposals.shape[0]):
        label_iou = gts[best_iou_index[i]][2]
        label_overlap = gts[best_overlap_index[i]][2]
        if label_iou != label_overlap:
            label = label_iou if label_iou != 0 else label_overlap
        else:
            label = label_iou
        if best_iou[i] == 0 and best_overlap[i] == 0:
            out.write(f"0 0 0 {proposals[i][0]} {proposals[i][1]}\n")
        else:
            out.write(f"{int(label)} {best_iou[i]} {best_overlap[i]} "
                      f"{proposals[i][0]} {proposals[i][1]}\n")


def main():
    p = argparse.ArgumentParser(description="convert proposal format")
    p.add_argument("--ann-file",
                   default="data/ActivityNet/anet_anno_val.json")
    p.add_argument("--activity-index-file",
                   default="data/ActivityNet/anet_activity_indexes_val.txt")
    p.add_argument("--proposal-file", default="results.json")
    p.add_argument("--formatted-proposal-file",
                   default="anet_val_formatted_proposal.txt")
    args = p.parse_args()

    activity_index = {line.strip(): i for i, line in
                      enumerate(open(args.activity_index_file))}
    with open(args.ann_file) as f:
        anno_database = json.load(f)
    with open(args.proposal_file) as f:
        results = json.load(f)["results"]

    proposals = {vid: np.array([[p["segment"][0], p["segment"][1],
                                 p["score"]] for p in props])
                 for vid, props in results.items()}

    with open(args.formatted_proposal_file, "w") as out:
        for video_idx, (video_name, info) in enumerate(anno_database.items()):
            video_id = video_name[2:]
            gts = np.array([[a["segment"][0], a["segment"][1],
                             activity_index[a["label"]]]
                            for a in info["annotations"]])
            tiou, t_overlap = pairwise_temporal_iou(
                proposals[video_id][:, :2].astype(float),
                gts[:, :2].astype(float))
            dump_formatted_proposal(video_idx, video_id,
                                    info["duration_frame"], info["fps"],
                                    gts, proposals[video_id], tiou,
                                    t_overlap, out)


if __name__ == "__main__":
    main()
