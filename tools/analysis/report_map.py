#!/usr/bin/env python
"""Report detection mAP for an ActivityNet proposal file (reference
``tools/analysis/report_map.py``).

Assigns an action label to every class-agnostic proposal and evaluates
interpolated detection mAP over tIoU 0.5:0.05:0.95.

Label assignment (``--cls``):

* ``cuhk17_top1`` — the reference's scheme: each video's proposals take the
  top-1 class from the CUHK-17 challenge predictions. The reference
  downloads ``cuhk_anet17_pred.json`` on demand; this environment has no
  egress, so the file must already exist (``--cls-file``).
* ``label_in_file`` — proposals already carry a ``label`` field.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def cuhk17_top1(proposal_file, cls_file, det_output):
    if not os.path.exists(cls_file):
        raise FileNotFoundError(
            f"{cls_file} not found. The reference fetches it from "
            "download.openmmlab.com/mmaction/localization/"
            "cuhk_anet17_pred.json; place it locally and pass --cls-file.")
    with open(proposal_file) as f:
        proposal = json.load(f)
    with open(cls_file) as f:
        cuhk_pred = json.load(f)["results"]
    results = proposal["results"]
    for vid, props in results.items():
        top1 = max(cuhk_pred[vid], key=lambda x: x["score"])
        results[vid] = [dict(label=top1["label"], **item) for item in props]
    proposal["results"] = results
    with open(det_output, "w") as f:
        json.dump(proposal, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--proposal", required=True, help="proposal file")
    p.add_argument("--gt", default="data/ActivityNet/anet_anno_val.json")
    p.add_argument("--cls", default="cuhk17_top1",
                   choices=["cuhk17_top1", "label_in_file"])
    p.add_argument("--cls-file", default="cuhk_anet17_pred.json",
                   help="external classification predictions (cuhk17_top1)")
    p.add_argument("--det-output", default="det_result.json")
    args = p.parse_args()

    if args.cls == "cuhk17_top1":
        cuhk17_top1(args.proposal, args.cls_file, args.det_output)
        det_file = args.det_output
    else:
        det_file = args.proposal

    from adapt_image_models_tpu.core.eval_detection import (
        ActivityNetDetection,
    )
    det = ActivityNetDetection(args.gt, det_file,
                               tiou_thresholds=np.linspace(0.5, 0.95, 10),
                               verbose=True)
    mAP, average_mAP = det.evaluate()
    print("[RESULTS] Performance on ActivityNet detection task.\n"
          f"mAP: {mAP}\nAverage-mAP: {average_mAP}")


if __name__ == "__main__":
    main()
