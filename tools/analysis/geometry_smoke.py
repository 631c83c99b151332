#!/usr/bin/env python
"""On-chip geometry smoke matrix for the fused train/eval paths (VERDICT r4
item 1): one eval forward + one train step at every (batch, frames, model)
corner, each in a FRESH SUBPROCESS so a Mosaic kernel fault in one cell
cannot take down the sweep — the cell is recorded as CRASH and the matrix
continues once the worker recovers.

The reference legally runs micro-batches down to 1
(``videos_per_gpu / update_interval``, reference ``apis/train.py:53``;
e.g. ``vitclip_base_hmdb51.py:174`` update_interval=8), so every batch in
{1, 2, 4, 8} must be fault-free — the CPU suite structurally cannot see
Mosaic faults, which is why this matrix exists.

    python tools/analysis/geometry_smoke.py --out smoke.json
    python tools/analysis/geometry_smoke.py --batches 4 --frames 8 --models b16

The per-cell child mode (used internally):
    python tools/analysis/geometry_smoke.py --cell b16 8 4 train
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

MODELS = {
    "b16": dict(patch_size=16, width=768, layers=12, heads=12),
    "l14": dict(patch_size=14, width=1024, layers=24, heads=16),
}


def run_cell(model_key: str, frames: int, batch: int, mode: str) -> dict:
    """One smoke cell in-process: build the fused-core model, run one eval
    forward or 2 train steps, report timing + finiteness."""
    import jax
    import jax.numpy as jnp
    import optax

    from adapt_image_models_tpu.core.train_state import (
        create_train_state, make_train_step, make_eval_step,
    )
    from adapt_image_models_tpu.models import build_model

    spec = MODELS[model_key]
    model = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=224, num_frames=frames,
                      drop_path_rate=0.2 if mode == "train" else 0.0,
                      compute_dtype="bfloat16", attention_core="fused",
                      use_checkpoint=(mode == "train"), **spec),
        cls_head=dict(type="I3DHead", num_classes=400,
                      in_channels=spec["width"], dropout_ratio=0.5),
        test_cfg=dict(average_clips="prob")))
    x = jnp.zeros((batch, 1, 3, frames, 224, 224), jnp.float32)
    flat = x.reshape((-1,) + x.shape[2:])
    params = model.init(jax.random.PRNGKey(0), flat)

    t0 = time.time()
    if mode == "eval":
        step = jax.jit(make_eval_step(model))
        out = step(params, x)
        out.block_until_ready()
        compile_s = time.time() - t0
        t1 = time.time()
        out = step(params, x)
        out.block_until_ready()
        ok = bool(jnp.all(jnp.isfinite(out)))
        return {"ok": ok, "compile_s": round(compile_s, 1),
                "step_ms": round(1e3 * (time.time() - t1), 1)}
    tx = optax.adamw(1e-4)
    state = create_train_state(params["params"], tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    batch_d = {"imgs": x, "label": jnp.zeros((batch,), jnp.int32)}
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batch_d, rng)
    loss0 = float(metrics["loss"])
    compile_s = time.time() - t0
    t1 = time.time()
    state, metrics = step(state, batch_d, rng)
    loss1 = float(metrics["loss"])
    import math
    ok = math.isfinite(loss0) and math.isfinite(loss1)
    return {"ok": ok, "compile_s": round(compile_s, 1),
            "step_ms": round(1e3 * (time.time() - t1), 1),
            "loss": round(loss1, 3)}


def wait_for_tpu(timeout_s: int = 2400) -> bool:
    """Block until a trivial op succeeds in a fresh subprocess (the worker
    restarts some minutes after a kernel fault)."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((8, 128)))))"],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(30)
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cell", nargs=4, metavar=("MODEL", "T", "B", "MODE"),
                   help="internal: run one cell in-process and print json")
    p.add_argument("--batches", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--frames", nargs="+", type=int, default=[8, 16, 32])
    p.add_argument("--models", nargs="+", default=["b16", "l14"],
                   choices=list(MODELS))
    p.add_argument("--modes", nargs="+", default=["eval", "train"])
    p.add_argument("--cell-timeout", type=int, default=1500)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.cell:
        m, t, b, mode = args.cell
        print(json.dumps(run_cell(m, int(t), int(b), mode)))
        return

    results = {}
    for m in args.models:
        for t in args.frames:
            for b in args.batches:
                for mode in args.modes:
                    key = f"{m}_{t}f_b{b}_{mode}"
                    cmd = [sys.executable, os.path.abspath(__file__),
                           "--cell", m, str(t), str(b), mode]
                    t0 = time.time()
                    try:
                        r = subprocess.run(cmd, capture_output=True,
                                           text=True,
                                           timeout=args.cell_timeout)
                    except subprocess.TimeoutExpired:
                        results[key] = {"ok": False, "error": "TIMEOUT"}
                        print(key, "TIMEOUT", flush=True)
                        wait_for_tpu()
                        continue
                    if r.returncode == 0 and r.stdout.strip():
                        cell = json.loads(r.stdout.strip().splitlines()[-1])
                        results[key] = cell
                        print(key, json.dumps(cell), flush=True)
                    else:
                        tail = (r.stderr or "")[-400:]
                        crash = ("crashed" in tail or "kernel fault" in tail
                                 or r.returncode != 0)
                        results[key] = {"ok": False,
                                        "error": "CRASH" if crash else tail,
                                        "tail": tail}
                        print(key, "CRASH", round(time.time() - t0, 1), "s",
                              flush=True)
                        wait_for_tpu()
    bad = [k for k, v in results.items() if not v.get("ok")]
    print(f"\n{len(results) - len(bad)}/{len(results)} cells green;"
          f" failures: {bad or 'none'}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
