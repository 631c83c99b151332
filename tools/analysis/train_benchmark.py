#!/usr/bin/env python
"""Train-step throughput benchmark (the reference publishes s/iter training
tables, ``docs/benchmark.md:9-24``; ``bench.py`` stays eval-only because the
driver runs it under a timeout and the train step's backward compile is
minutes-long on the relay).

    python tools/analysis/train_benchmark.py <config> \
        [--batches 8 16] [--iters 4] [--use-checkpoint]

Prints one JSON line per batch size:
    {"batch": B, "train_clips_per_s": X, "ms_per_step": Y}

Measured (v5e single chip, AIM ViT-B/16 8f bf16 fused kernels,
AdamW on the adapter partition, 2026-08):
    batch 8  (reference per-GPU recipe): 63 clips/s, 127 ms/step
    batch 16:                            56 clips/s
    batch 32 + per-block remat:          53 clips/s
Forward alone runs at 145 clips/s (batch 8) / 295 (batch 64); the backward
costs ~1.3x forward (frozen-weight gradients are cut by stop_gradient at
trace time — see core/train_state.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batches", type=int, nargs="+", default=[8])
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--use-checkpoint", action="store_true",
                   help="per-block activation remat (needed for batch >= 16"
                        " on ViT-B without TP)")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.config.config import apply_cfg_options
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.parallel.partition import partition_params
    from adapt_image_models_tpu.core.optim import build_optimizer
    from adapt_image_models_tpu.core.train_state import (
        create_train_state, make_train_step,
    )

    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)
    model_cfg = dict(cfg["model"])
    model_cfg.pop("test_cfg", None)
    model_cfg.pop("train_cfg", None)
    if args.use_checkpoint:
        model_cfg["backbone"] = dict(model_cfg["backbone"],
                                     use_checkpoint=True)
    model = build_model(model_cfg)

    bb = model_cfg["backbone"]
    t = int(bb.get("num_frames", 8))
    res = int(bb.get("input_resolution", bb.get("img_size", 224)))

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, t, res, res)))
    params = variables["params"]
    trainable, _ = partition_params(params)
    tx = build_optimizer(dict(cfg["optimizer"]), trainable,
                         schedule=cfg["optimizer"]["lr"])
    state = create_train_state(params, tx)
    train_step = jax.jit(make_train_step(model, tx))

    for batch in args.batches:
        keys = jax.random.split(jax.random.PRNGKey(batch), args.iters)
        batches = [dict(imgs=jax.random.normal(
                            k, (batch, 3, t, res, res), jnp.bfloat16),
                        label=jnp.zeros((batch,), jnp.int32))
                   for k in keys]
        s, m = train_step(state, batches[0], jax.random.PRNGKey(1))
        _ = float(m["loss"])  # force compile + warmup fetch
        t0 = time.perf_counter()
        losses = []
        for b in batches:
            s, m = train_step(s, b, jax.random.PRNGKey(2))
            losses.append(m["loss"])
        _ = sum(float(x) for x in losses)  # forced fetch (relay semantics)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "batch": batch,
            "train_clips_per_s": round(batch * args.iters / dt, 1),
            "ms_per_step": round(dt / args.iters * 1000, 1),
        }))


if __name__ == "__main__":
    main()
