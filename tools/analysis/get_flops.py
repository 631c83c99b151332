#!/usr/bin/env python
"""Model complexity report (reference ``tools/analysis/get_flops.py``).

Uses XLA's own compiled cost analysis instead of mmcv's module hooks — the
numbers are what the TPU actually executes (fused, layout-assigned).

    python tools/analysis/get_flops.py <config> [--shape 1 3 8 224 224]
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
    p.add_argument("--shape", type=int, nargs="+", default=None,
                   help="input shape B C T H W (default from test pipeline)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    from adapt_image_models_tpu.parallel.partition import (
        partition_params, count_params,
    )

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, test_cfg=test_cfg)

    if args.shape:
        shape = tuple(args.shape)
    else:
        proc = build_sample_processor(cfg["data"]["test"]["pipeline"])
        h, w = proc.output_size()
        shape = (1, 3, proc.sampler.clip_len, h, w)

    x = jnp.zeros(shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    total = count_params(params)
    trainable, frozen = partition_params(params["params"])

    lowered = jax.jit(lambda p, v: model.apply(p, v)).lower(params, x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    bytes_accessed = cost.get("bytes accessed", float("nan"))

    print(f"Input shape: {shape}")
    print(f"Params: {total / 1e6:.2f} M  "
          f"(tunable {count_params(trainable) / 1e6:.2f} M, "
          f"frozen {count_params(frozen) / 1e6:.2f} M)")
    print(f"FLOPs (XLA compiled, per forward): {flops / 1e9:.3f} G")
    print(f"HBM bytes accessed: {bytes_accessed / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
