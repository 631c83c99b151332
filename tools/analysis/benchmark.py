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


if __name__ == "__main__":
    main()
