#!/usr/bin/env python
"""Evaluation CLI (parity: reference ``tools/test.py`` + ``dist_test.sh``).

    python tools/test.py <config> [--checkpoint ckpt] [--split test] \
        [--metrics top_k_accuracy mean_class_accuracy] \
        [--average-clips prob|score] [--out results.json] \
        [--cfg-options k=v ...]

``--checkpoint`` accepts either an orbax directory produced by training or a
torch .pth released-AIM checkpoint (converted on the fly).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()

from adapt_image_models_tpu.config import Config
from adapt_image_models_tpu.utils.logger import get_root_logger


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a video recognizer")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--exported", default=None,
                   help="StableHLO artifact from tools/deployment/export.py:"
                        " evaluate through it (reference tools/test.py ONNX/"
                        "TensorRT analog); no checkpoint needed")
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--metrics", nargs="+",
                   default=["top_k_accuracy", "mean_class_accuracy"])
    p.add_argument("--average-clips", default=None,
                   choices=["prob", "score"])
    p.add_argument("--out", default=None, help="dump metrics json")
    p.add_argument("--dump-scores", default=None,
                   help="save per-sample scores npz (for report_accuracy)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def load_params(cfg, checkpoint, seed):
    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.apis.inference import init_recognizer

    from adapt_image_models_tpu.core.train_state import split_variables

    model, params = init_recognizer(cfg.to_dict(), checkpoint=None, seed=seed)
    params, model_state = split_variables(params)
    if checkpoint is None:
        pass
    elif os.path.isdir(checkpoint):  # orbax dir from our trainer
        import orbax.checkpoint as ocp
        tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(checkpoint))
        from adapt_image_models_tpu.parallel.partition import merge_params
        params = merge_params(tree["trainable"], tree["frozen"])
        model_state = tree.get("model_state") or model_state
    else:  # torch .pth released checkpoint
        import torch
        from adapt_image_models_tpu.convert.aim_import import (
            load_aim_checkpoint_into_params,
        )
        ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
        params = load_aim_checkpoint_into_params(params, ckpt, strict=False)
    if model_state:
        return model, {"params": params, **model_state}
    return model, params


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    overrides = {}
    for item in args.cfg_options:
        k, _, v = item.partition("=")
        overrides[k] = v
    cfg.merge_from_dict(overrides)
    if args.average_clips:
        cfg.merge_from_dict({"model.test_cfg.average_clips": args.average_clips})

    logger = get_root_logger()
    if args.exported:
        from adapt_image_models_tpu.apis.test import run_exported_evaluation
        out = run_exported_evaluation(
            cfg.to_dict(), args.exported, split=args.split,
            metrics=tuple(args.metrics),
            return_scores=bool(args.dump_scores))
    else:
        model, params = load_params(cfg, args.checkpoint, args.seed)

        from adapt_image_models_tpu.apis.test import run_evaluation
        out = run_evaluation(cfg.to_dict(), model=model, params=params,
                             split=args.split, metrics=tuple(args.metrics),
                             return_scores=bool(args.dump_scores))
    if args.dump_scores:
        import numpy as np
        results, scores, labels = out
        np.savez(args.dump_scores, scores=scores, labels=labels)
        logger.info(f"dumped scores to {args.dump_scores}")
    else:
        results = out
    logger.info(f"Results: {results}")
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
