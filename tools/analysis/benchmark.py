#!/usr/bin/env python
"""Inference/training speed benchmark (reference ``tools/analysis/benchmark.py``).

Measures clips/sec for a config's model on synthetic device data, skipping
compile/warmup like the reference skips its first 50 iters. Uses distinct
inputs + forced fetches (the axon relay memoizes duplicate dispatches).

    python tools/analysis/benchmark.py <config> [--train] [--batch N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--train", action="store_true",
                   help="benchmark the full train step instead of forward")
    p.add_argument("--e2e", action="store_true",
                   help="end-to-end decode->device->logits over real mp4v "
                        "sources through the config's train pipeline "
                        "(dataloader-included iteration time, like the "
                        "reference's tools/analysis/benchmark.py:29-60)")
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1,
                   help="host decode workers for --e2e")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.data.pipeline import build_sample_processor

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    train_cfg = model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, train_cfg=train_cfg, test_cfg=test_cfg)

    proc = build_sample_processor(cfg["data"]["train"]["pipeline"])
    h, w = proc.output_size()
    t = proc.sampler.clip_len
    shape = (args.batch, 3, t, h, w)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, t, h, w)))

    if args.e2e:
        _run_e2e(cfg, model, params, args)
        return

    if args.train:
        from adapt_image_models_tpu.core.train_state import (
            create_train_state, make_train_step,
        )
        from adapt_image_models_tpu.core.optim import build_optimizer
        from adapt_image_models_tpu.parallel.partition import partition_params
        trainable, _ = partition_params(params["params"])
        tx = build_optimizer(dict(cfg["optimizer"]), trainable,
                             schedule=cfg["optimizer"]["lr"])
        state = create_train_state(params["params"], tx)
        step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
        num_classes = model_cfg["cls_head"]["num_classes"]

        def run(i):
            nonlocal state
            batch = {
                "imgs": jax.random.normal(jax.random.PRNGKey(i), shape),
                "label": jnp.arange(args.batch) % num_classes,
            }
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
            return float(metrics["loss"])
    else:
        fwd = jax.jit(lambda p, v: model.apply(p, v))

        def run(i):
            x = jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
            return float(fwd(params, x).sum())

    run(0)  # compile
    times = []
    for i in range(1, args.iters + 1):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    mode = "train-step" if args.train else "forward"
    print(f"{mode}: {med * 1e3:.1f} ms/iter  "
          f"{args.batch / med:.1f} clips/s  (batch {args.batch}, T={t}, {h}x{w})")


def _encode_sources(tmpdir, num_videos=8, frames=300, fps=30):
    """Real mp4v 240p sources (same construction as bench_processing.py)."""
    import cv2
    import numpy as np
    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (240, 320, 3)).astype(np.uint8), (11, 11), 5)
    paths = []
    for v in range(num_videos):
        path = os.path.join(tmpdir, f"v{v}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                            (320, 240))
        for i in range(frames):
            w.write(np.roll(base, i * 2 + v, axis=1))
        w.release()
        paths.append(path)
    return paths


def _run_e2e(cfg, model, params, args):
    """Sustained decode->device->logits clips/s, host decode in the loop.

    The reference times the dataloader-included iteration
    (``tools/analysis/benchmark.py:29-60``); this is the TPU equivalent:
    a VideoLoader (worker pool over the C++ FFmpeg decoder when built)
    feeds the jitted forward, and the wall clock covers both. Dispatches
    overlap the next batch's decode exactly as a real eval loop would.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from adapt_image_models_tpu.data.datasets import VideoDataset
    from adapt_image_models_tpu.data.loader import VideoLoader
    from adapt_image_models_tpu.data.transforms import (
        layout_from_pipeline, make_prepare_fn,
    )

    d = tempfile.mkdtemp()
    paths = _encode_sources(d)
    ann = os.path.join(d, "ann.txt")
    clips = max(64, args.batch * args.iters)
    with open(ann, "w") as f:
        f.write("\n".join(f"{paths[i % len(paths)]} 0"
                          for i in range(clips)))
    pipeline = cfg["data"]["train"]["pipeline"]
    dataset = VideoDataset(ann, pipeline)
    loader = VideoLoader(dataset, pipeline, batch_size=args.batch,
                         shuffle=True, num_workers=args.workers)

    # the loader's two-stage contract: host stage emits uint8
    # (B, V, T, H, W, C); normalize + FormatShape run on device exactly
    # like apis/train's prepare_fn
    norm = next((dict(s) for s in pipeline if s.get("type") == "Normalize"),
                {})
    prepare = make_prepare_fn(norm.get("mean", (122.769, 116.74, 104.04)),
                              norm.get("std", (68.493, 66.63, 70.321)),
                              dtype=jnp.bfloat16,
                              layout=layout_from_pipeline(pipeline))

    fwd = jax.jit(lambda p, v: model.apply(p, v))
    it = iter(loader)
    first = next(it)  # warm the pool + compile

    def to_clips(imgs):
        x = prepare(jnp.asarray(imgs))
        if x.ndim == 6:  # (B, V, C, T, H, W) -> fold views
            x = x.reshape((-1,) + x.shape[2:])
        return x

    float(fwd(params, to_clips(first["imgs"])).sum())
    n = 0
    t0 = time.perf_counter()
    outs = []
    for batch in it:
        x = to_clips(batch["imgs"])
        n += x.shape[0]
        outs.append(fwd(params, x))
    _ = sum(float(o.sum()) for o in outs)  # forced fetch (relay semantics)
    dt = time.perf_counter() - t0
    print(f"end-to-end decode->logits: {n / dt:.1f} clips/s "
          f"({args.workers} host workers, batch {args.batch}, "
          f"{n} clips, {dt:.1f}s)")


if __name__ == "__main__":
    main()
