#!/usr/bin/env python
"""On-chip A/B sweep of the eval attention-cell softmax layout knobs.

The round-4 knockout attribution (docs/benchmark.md) puts the remaining
eval slack in the two attention kernels' serialized VPU softmax: the
stacked-head restructure concatenates ALL heads' score matrices, so the
cell runs MXU (scores) -> VPU (one big softmax) -> MXU (AV) with no
overlap. Chunking the stack lets Mosaic schedule chunk i+1's score
matmuls under chunk i's softmax. This tool measures the full flagship
model per setting in ONE process — the knobs are module globals read at
trace time, so a fresh ``jax.jit`` wrapper per setting retraces with the
new values (no per-setting child process / TPU re-init).

    python tools/analysis/sweep_softmax_layout.py [--batch 512] [--iters 6]

Prints one JSON line per setting: {"setting", "clips_per_s"}.
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
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--patch", type=int, default=16)
    p.add_argument("--settings", nargs="+", default=None,
                   help="subset of setting names to run")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.ops import (fused_qkv_attention as fqa,
                                            fused_temporal_attention as fta)

    model = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=224,
                      patch_size=args.patch,
                      width=args.width, layers=args.layers, heads=args.heads,
                      num_frames=args.frames,
                      drop_path_rate=0.0, compute_dtype="bfloat16",
                      attention_core="fused"),
        cls_head=dict(type="I3DHead", num_classes=400,
                      in_channels=args.width, dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    ))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, args.frames, 224, 224),
                                  jnp.float32))

    # (name, spatial _STACK_ROWS, temporal _TSTACK_HEADS, fast_softmax)
    # spatial chunk heads = _STACK_ROWS // 208: 2496->12(all), 1248->6,
    # 832->4, 624->3, 416->2
    settings = [
        ("baseline", 2496, 16, False),
        ("s6", 1248, 16, False),
        ("s4", 832, 16, False),
        ("s3", 624, 16, False),
        ("t6", 2496, 6, False),
        ("t4", 2496, 4, False),
        ("t2", 2496, 2, False),
        ("s4t4", 832, 4, False),
        ("s6t6", 1248, 6, False),
        ("fast", 2496, 16, True),
        ("fast_s4", 832, 16, True),
        ("fast_s6", 1248, 16, True),
    ]
    if args.settings:
        settings = [s for s in settings if s[0] in args.settings]

    batch = args.batch
    keys = jax.random.split(jax.random.PRNGKey(batch), args.iters + 1)
    warm = jax.random.normal(keys[0], (batch, 3, args.frames, 224, 224),
                             jnp.bfloat16)
    xs = [jax.random.normal(k, (batch, 3, args.frames, 224, 224),
                            jnp.bfloat16) for k in keys[1:]]

    for name, stack_rows, tstack, fast in settings:
        fqa._STACK_ROWS = stack_rows
        fta._TSTACK_HEADS = tstack
        fqa._FAST_SOFTMAX = fast  # fta re-imports from fqa at trace time
        fwd = jax.jit(lambda p, v: model.apply(p, v))  # new identity
        try:
            float(fwd(params, warm).sum())  # compile + warmup
            t0 = time.perf_counter()
            outs = [fwd(params, x) for x in xs]
            _ = sum(float(o.sum()) for o in outs)
            dt = time.perf_counter() - t0
            print(json.dumps({"setting": name,
                              "clips_per_s": round(batch * len(xs) / dt, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"setting": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
