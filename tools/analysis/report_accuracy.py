#!/usr/bin/env python
"""Score fusion across result dumps (reference ``tools/analysis/report_accuracy.py``):
average several models' per-sample score files and report fused accuracy.

    python tools/analysis/report_accuracy.py --scores a.npz b.npz \
        --ann val_list.txt [--weights 1.0 0.5]

Score files: .npz with 'scores' (N, C) (+ optional 'labels') — as written by
tools/test.py --dump-scores.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scores", nargs="+", required=True)
    p.add_argument("--ann", default=None)
    p.add_argument("--weights", nargs="+", type=float, default=None)
    args = p.parse_args()

    from adapt_image_models_tpu.core.metrics import (
        top_k_accuracy, mean_class_accuracy, get_weighted_score,
    )

    loaded = [np.load(s) for s in args.scores]
    weights = args.weights or [1.0] * len(loaded)
    fused = get_weighted_score([d["scores"] for d in loaded],
                               weights) / sum(weights)

    labels = None
    for d in loaded:
        if "labels" in d:
            labels = d["labels"]
    if labels is None and args.ann:
        labels = np.array([int(l.split()[-1]) for l in open(args.ann)
                           if l.strip()])
    if labels is None:
        print("no labels available (pass --ann)")
        sys.exit(1)

    top1, top5 = top_k_accuracy(fused, labels, (1, 5))
    mca = mean_class_accuracy(fused, labels)
    print(f"fused over {len(loaded)} models: top1 {top1:.4f} top5 {top5:.4f} "
          f"mean-class {mca:.4f}")


if __name__ == "__main__":
    main()
