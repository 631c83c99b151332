#!/usr/bin/env python
"""Re-evaluate metrics from dumped scores without re-running the model
(reference ``tools/analysis/eval_metric.py``).

    python tools/test.py <config> --dump-scores scores.npz ...
    python tools/analysis/eval_metric.py <config> scores.npz \
        [--split test] [--metrics top_k_accuracy mean_class_accuracy]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("scores", help="npz produced by tools/test.py --dump-scores")
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--metrics", nargs="+",
                   default=["top_k_accuracy", "mean_class_accuracy"])
    p.add_argument("--out", default=None)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.config.config import apply_cfg_options
    from adapt_image_models_tpu.data.datasets import build_dataset

    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)
    ds_cfg = dict(cfg["data"][args.split])
    dataset = build_dataset(ds_cfg)

    dump = np.load(args.scores)
    scores = dump["scores"]
    results = dataset.evaluate(scores, metrics=tuple(args.metrics))
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
