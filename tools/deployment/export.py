#!/usr/bin/env python
"""Model export (the reference ships ONNX export + TensorRT/ONNXRuntime
inference, ``tools/deployment/pytorch2onnx.py`` + ``tools/test.py``; the
TPU-native serialization is ``jax.export`` StableHLO — portable, versioned,
reloadable without python model code).

    python tools/deployment/export.py <config> --out model.stablehlo \
        [--checkpoint ckpt] [--batch 1]
    python tools/deployment/export.py --load model.stablehlo  # smoke-run
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
    p.add_argument("config", nargs="?")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--load", default=None,
                   help="load + smoke-run a previously exported artifact")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import numpy as np

    if args.load:
        with open(args.load, "rb") as f:
            exported = jexport.deserialize(bytearray(f.read()))
        in_shape = exported.in_avals[0].shape
        x = np.zeros(in_shape, np.float32)
        out = exported.call(x)
        print(f"loaded {args.load}: in {in_shape} -> out {out.shape}")
        return

    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.apis.inference import init_recognizer
    from adapt_image_models_tpu.data.pipeline import build_sample_processor

    cfg = Config.fromfile(args.config)
    from adapt_image_models_tpu.config.config import apply_cfg_options
    apply_cfg_options(cfg, args.cfg_options)
    model, params = init_recognizer(cfg.to_dict(), checkpoint=args.checkpoint)
    proc = build_sample_processor(cfg["data"]["test"]["pipeline"])
    h, w = proc.output_size()
    t = proc.sampler.clip_len

    # close over params so the artifact is self-contained
    from adapt_image_models_tpu.core.train_state import as_variables
    variables = as_variables(params)

    def infer(x):
        return model.apply(variables, x)

    x_spec = jax.ShapeDtypeStruct((args.batch, 3, t, h, w), jnp.float32)
    exported = jexport.export(jax.jit(infer))(x_spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported StableHLO ({len(blob) / 1e6:.1f} MB) -> {args.out}")


if __name__ == "__main__":
    main()
