#!/usr/bin/env python
"""Single-video inference demo (reference ``demo/demo.py``).

    python demo/demo.py <config> <video> [--checkpoint ckpt] \
        [--label-map classes.txt] [--topk 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("video")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--label-map", default=None)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.apis.inference import (
        init_recognizer, inference_recognizer,
    )

    cfg = Config.fromfile(args.config)
    from adapt_image_models_tpu.config.config import apply_cfg_options
    apply_cfg_options(cfg, args.cfg_options)
    model, params = init_recognizer(cfg.to_dict(), checkpoint=args.checkpoint)
    results = inference_recognizer(model, params, cfg.to_dict(), args.video,
                                   topk=args.topk)

    labels = None
    if args.label_map and os.path.exists(args.label_map):
        labels = [l.strip() for l in open(args.label_map)]
    print(f"Top-{args.topk} for {args.video}:")
    for cls, score in results:
        name = labels[cls] if labels and cls < len(labels) else str(cls)
        print(f"  {name}: {score:.4f}")


if __name__ == "__main__":
    main()
