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
    """Run the measurement in timed child processes, retrying on relay
    outages. The axon relay sporadically hangs at backend init (observed
    r3: >1 h blocked inside the first dispatch with no error) — an
    in-process retry cannot recover from that, so the parent re-invokes
    itself with AIM_BENCH_CHILD=1 under a hard timeout and retries.

    The parent also A/Bs the two staged kernel-layout candidates from the
    knockout sweep (docs/benchmark.md) — ``AIM_KERNEL_LN=mxu`` and
    ``AIM_EVAL_SOFTMAX=t`` — because both are read at kernel import, i.e.
    per-process. The baseline config runs first (guaranteed number), each
    flip only if budget remains; the reported value is the best config,
    named on stderr. Set AIM_BENCH_NO_AB=1 for a baseline-only run."""
    import subprocess

    deadline = time.time() + int(os.environ.get("AIM_BENCH_DEADLINE_S",
                                                40 * 60))
    configs = [("baseline", {})]
    if not os.environ.get("AIM_BENCH_NO_AB"):
        configs += [
            ("ln=mxu", {"AIM_KERNEL_LN": "mxu"}),
            ("softmax=t", {"AIM_EVAL_SOFTMAX": "t"}),
            ("ln=mxu+softmax=t", {"AIM_KERNEL_LN": "mxu",
                                  "AIM_EVAL_SOFTMAX": "t"}),
        ]
    best_line, best_value, best_name = None, -1.0, None
    for name, extra in configs:
        # a flip config is strictly optional: never let it starve the
        # baseline's retry budget, and skip it when little time remains
        if best_line is not None and time.time() + 6 * 60 > deadline:
            print(f"bench: skipping config {name} (deadline)",
                  file=sys.stderr)
            continue
        attempt = 0
        while True:
            attempt += 1
            budget = max(60, min(15 * 60, int(deadline - time.time())))
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env={**os.environ, "AIM_BENCH_CHILD": "1", **extra},
                    capture_output=True, text=True, timeout=budget)
                out = proc.stdout.strip().splitlines()
                if proc.returncode == 0 and out:
                    value = json.loads(out[-1]).get("value", 0.0)
                    print(f"bench config {name}: {value} clips/s",
                          file=sys.stderr)
                    if value > best_value:
                        best_line, best_value, best_name = out[-1], value, name
                    break
                err = (proc.stderr or "")[-2000:]
            except subprocess.TimeoutExpired:
                err = (f"attempt {attempt}: timed out after {budget}s "
                       "(relay hang)")
            print(f"bench attempt {attempt} ({name}) failed: {err}",
                  file=sys.stderr)
            if time.time() + 120 > deadline:
                break
            # only the baseline earns unlimited retries; one retry per flip
            if best_line is not None and attempt >= 2:
                break
            time.sleep(60)
        if best_line is None and time.time() + 120 > deadline:
            return 1
    if best_line is None:
        return 1
    print(f"bench: best config = {best_name}", file=sys.stderr)
    print(best_line)
    return 0


def main():
    import jax
    import jax.numpy as jnp

    from adapt_image_models_tpu.models import build_model

    # AIM_BENCH_TINY=1: end-to-end smoke of the measurement path (parent
    # A/B loop + child protocol) with a CPU-feasible model — the headline
    # geometry at ViT-B/16 takes ~404 GFLOP/clip, unreachable off-chip.
    # The tiny model keeps the XLA attention core (Pallas does not lower on
    # CPU; the kernels carry their own interpret-mode parity tests).
    tiny = bool(os.environ.get("AIM_BENCH_TINY"))
    res, width, layers, heads, frames = \
        (32, 64, 2, 4, 2) if tiny else (224, 768, 12, 12, 8)
    model = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=res, patch_size=16,
                      width=width, layers=layers, heads=heads,
                      num_frames=frames,
                      drop_path_rate=0.0, compute_dtype="bfloat16",
                      attention_core="xla" if tiny else "fused"),
        cls_head=dict(type="I3DHead", num_classes=400, in_channels=width,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    ))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, frames, res, res), jnp.float32))

    fwd = jax.jit(lambda p, v: model.apply(p, v))

    import numpy as np

    best = 0.0
    last_err = None
    for batch in ((4,) if tiny else (128, 256, 512)):
        # distinct inputs per iteration (the axon relay memoizes repeated
        # identical dispatches) + a forced scalar fetch per result
        # (block_until_ready does not synchronize over the relay). Dispatches
        # are issued back-to-back and fetched at the end — the async-dispatch
        # pipelining any real eval loop gets for free.
        keys = jax.random.split(jax.random.PRNGKey(batch), 7)
        warm = jax.random.normal(keys[0], (batch, 3, frames, res, res),
                                 jnp.bfloat16)
        xs = [jax.random.normal(k, (batch, 3, frames, res, res),
                                jnp.bfloat16) for k in keys[1:]]
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
