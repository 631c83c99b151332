#!/usr/bin/env python
"""Data-pipeline throughput benchmark (reference ``tools/analysis/bench_processing.py``).

Measures decode+transform clips/sec of a config's train pipeline over its
dataset (or synthetic sources with --synthetic).

    python tools/analysis/bench_processing.py <config> [--batches 10]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batches", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--synthetic", action="store_true",
                   help="benchmark over synthetic videos instead of the "
                        "config's dataset")
    args = p.parse_args()

    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.data.datasets import build_dataset, VideoDataset
    from adapt_image_models_tpu.data.loader import VideoLoader

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg["data"]["train"])
    pipeline = ds_cfg.pop("pipeline")
    if args.synthetic:
        ann = os.path.join(tempfile.mkdtemp(), "ann.txt")
        with open(ann, "w") as f:
            f.write("\n".join(f"synthetic://{i} 0" for i in range(256)))
        dataset = VideoDataset(ann, pipeline)
    else:
        dataset = build_dataset({**ds_cfg, "pipeline": pipeline})

    loader = VideoLoader(dataset, pipeline, batch_size=args.batch_size,
                         shuffle=True, num_workers=args.workers)
    it = iter(loader)
    next(it)  # warm the pool
    t0 = time.perf_counter()
    n = 0
    for i, batch in enumerate(it):
        n += batch["imgs"].shape[0]
        if i + 1 >= args.batches:
            break
    dt = time.perf_counter() - t0
    print(f"host pipeline: {n / dt:.1f} clips/s "
          f"({args.workers} workers, batch {args.batch_size})")


if __name__ == "__main__":
    main()
