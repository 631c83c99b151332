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
                        "config's dataset (procedural frames, no codec)")
    p.add_argument("--encode", action="store_true",
                   help="encode real mp4v 240p clips to a temp dir and "
                        "benchmark the full decode path over them")
    args = p.parse_args()

    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.data.datasets import build_dataset, VideoDataset
    from adapt_image_models_tpu.data.loader import VideoLoader

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg["data"]["train"])
    pipeline = ds_cfg.pop("pipeline")
    if args.encode:
        import cv2
        import numpy as np
        d = tempfile.mkdtemp()
        rng = np.random.default_rng(0)
        base = cv2.GaussianBlur(
            rng.integers(0, 255, (240, 320, 3)).astype(np.uint8), (11, 11), 5)
        paths = []
        for v in range(8):
            path = os.path.join(d, f"v{v}.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                                (320, 240))
            for i in range(300):
                w.write(np.roll(base, i * 2 + v, axis=1))
            w.release()
            paths.append(path)
        ann = os.path.join(d, "ann.txt")
        with open(ann, "w") as f:
            f.write("\n".join(f"{paths[i % len(paths)]} 0"
                              for i in range(256)))
        dataset = VideoDataset(ann, pipeline)
    elif args.synthetic:
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
