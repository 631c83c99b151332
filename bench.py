#!/usr/bin/env python
"""Benchmark: flagship AIM ViT-B/16 8-frame eval throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: clips/sec/chip where a clip = one 8-frame 224x224 view through the
full Recognizer3D (backbone + head), bf16 compute — the unit of work of the
K400 8x3x1 protocol (each sample costs 3 clips). ~202 GFLOPs per clip
(reference: 606 GFLOPs for the 3-view sample, README.md:90).

Baseline: the reference (torch/A100) has no published AIM throughput, so we
use a first-principles A100 estimate. The fork's AIM ViT-B/16 8-frame clip
costs ~404 GFLOPs (FMA=2 convention; the README's "202 G" per clip counts
MACs). A100 bf16 dense peak 312 TFLOP/s at 40% achieved MFU (generous for
eval-size ViT batches with flash-attn) -> 312e12*0.4/404e9 ~= 309 clips/s.
vs_baseline = value / 309.

Honest ceiling: ONE v5e chip peaks at 197 TFLOP/s bf16, so the compute
roofline at 404 GFLOP/clip is ~487 clips/s = 1.58x this baseline —
"vs_baseline >= 5" is physically impossible on a single chip; >=5x requires
~4 chips at near-linear data-parallel scaling (the multichip path validated
by dryrun_multichip / tests/test_runtime/test_multichip_dryrun.py).
"""

import json
import os
import sys
import time

A100_BASELINE_CLIPS_PER_S = 309.0


def run_with_watchdog() -> int:
    """Run the measurement in a timed child process, retrying on relay
    outages. The axon relay sporadically hangs at backend init (observed
    r3: >1 h blocked inside the first dispatch with no error) — an
    in-process retry cannot recover from that, so the parent re-invokes
    itself with AIM_BENCH_CHILD=1 under a hard timeout and retries."""
    import subprocess

    deadline = time.time() + int(os.environ.get("AIM_BENCH_DEADLINE_S",
                                                40 * 60))
    attempt = 0
    while True:
        attempt += 1
        budget = max(60, min(15 * 60, int(deadline - time.time())))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "AIM_BENCH_CHILD": "1"},
                capture_output=True, text=True, timeout=budget)
            out = proc.stdout.strip().splitlines()
            if proc.returncode == 0 and out:
                print(out[-1])
                return 0
            err = (proc.stderr or "")[-2000:]
        except subprocess.TimeoutExpired:
            err = f"attempt {attempt}: timed out after {budget}s (relay hang)"
        print(f"bench attempt {attempt} failed: {err}", file=sys.stderr)
        if time.time() + 120 > deadline:
            return 1
        time.sleep(60)


def main():
    import jax
    import jax.numpy as jnp

    from adapt_image_models_tpu.models import build_model

    model = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=224, patch_size=16,
                      width=768, layers=12, heads=12, num_frames=8,
                      drop_path_rate=0.0, compute_dtype="bfloat16",
                      attention_core="fused"),
        cls_head=dict(type="I3DHead", num_classes=400, in_channels=768,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    ))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 8, 224, 224), jnp.float32))

    fwd = jax.jit(lambda p, v: model.apply(p, v))

    import numpy as np

    best = 0.0
    last_err = None
    for batch in (128, 256, 512):
        # distinct inputs per iteration (the axon relay memoizes repeated
        # identical dispatches) + a forced scalar fetch per result
        # (block_until_ready does not synchronize over the relay). Dispatches
        # are issued back-to-back and fetched at the end — the async-dispatch
        # pipelining any real eval loop gets for free.
        keys = jax.random.split(jax.random.PRNGKey(batch), 7)
        warm = jax.random.normal(keys[0], (batch, 3, 8, 224, 224),
                                 jnp.bfloat16)
        xs = [jax.random.normal(k, (batch, 3, 8, 224, 224), jnp.bfloat16)
              for k in keys[1:]]
        for attempt in (1, 2):  # retry once on transient relay errors
            try:
                float(fwd(params, warm).sum())  # compile + warmup
                t0 = time.perf_counter()
                outs = [fwd(params, x) for x in xs]
                _ = sum(float(o.sum()) for o in outs)
                dt = time.perf_counter() - t0
                best = max(best, batch * len(xs) / dt)
                break
            except Exception as e:  # noqa: BLE001 — keep the best so far
                last_err = e
                time.sleep(20)
    if best == 0.0 and last_err is not None:
        raise last_err

    print(json.dumps({
        "metric": "aim_vitb16_8f_eval_throughput",
        "value": round(best, 1),
        "unit": "clips/sec/chip",
        "vs_baseline": round(best / A100_BASELINE_CLIPS_PER_S, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("AIM_BENCH_CHILD"):
        main()
    else:
        sys.exit(run_with_watchdog())
