#!/usr/bin/env python
"""One-command model-zoo accuracy verification (VERDICT r4 item 8).

For each row of ``tools/model_zoo.yml`` (the reference's released results,
``/root/reference/README.md:84-109``) this script:

1. resolves the released torch checkpoint — ``--local-pth`` today, or a
   best-effort download from the manifest ``url`` when egress exists;
2. converts it through ``convert/aim_import.py`` into the flax model built
   from the row's recipe (+ the row's ``cfg_options`` overrides);
3. checks the published total/tunable param counts (always possible, even
   without data or a checkpoint);
4. runs the row's full multi-view test protocol over the dataset split
   (reference ``tools/test.py`` flow) and diffs top-1/top-5 against the
   published numbers within ``--tol`` points.

Examples::

    # offline: param-count sweep over every manifest row
    python tools/verify_zoo.py --param-check-only

    # verify one row against a downloaded checkpoint + local K400 val list
    python tools/verify_zoo.py --model aim_vitb16_k400_8x3x1 \
        --local-pth ~/ckpts/vitclip_base_k400.pth \
        --cfg-options data.test.ann_file=data/k400/val.txt \
                      data.test.data_prefix=data/k400/videos_val
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_image_models_tpu.utils.env import apply_device_override  # noqa: E402

apply_device_override()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tools", "model_zoo.yml")


def parse_args():
    p = argparse.ArgumentParser(description="Verify released-model accuracy")
    p.add_argument("--manifest", default=MANIFEST)
    p.add_argument("--model", default=None,
                   help="manifest row name (default: every row)")
    p.add_argument("--local-pth", default=None,
                   help="path to the released .pth (skips download)")
    p.add_argument("--download-dir", default="zoo_checkpoints")
    p.add_argument("--param-check-only", action="store_true",
                   help="only verify published param counts (no data needed)")
    p.add_argument("--split", default="val", choices=["val", "test"])
    p.add_argument("--tol", type=float, default=0.3,
                   help="accuracy tolerance in percentage points")
    p.add_argument("--out", default=None, help="dump verdicts json")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="extra k=v config overrides (e.g. dataset paths)")
    return p.parse_args()


def load_manifest(path):
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    rows = []
    for dataset, entries in data.items():
        for e in entries:
            rows.append({"dataset": dataset, **e})
    return rows


def resolve_checkpoint(row, args):
    if args.local_pth:
        return args.local_pth
    url = row.get("url")
    if not url:
        raise FileNotFoundError(
            f"{row['name']}: the reference never released this checkpoint "
            "(README 'Pretrained model weights' TODO) — supply --local-pth "
            "with your own trained weights")
    os.makedirs(args.download_dir, exist_ok=True)
    dst = os.path.join(args.download_dir, row["name"] + ".pth")
    if os.path.exists(dst):
        return dst
    # Google Drive share links need the usercontent endpoint + confirm token
    import re
    import urllib.request

    m = re.search(r"/d/([\w-]+)", url)
    direct = (f"https://drive.usercontent.google.com/download?id={m.group(1)}"
              f"&export=download&confirm=t" if m else url)
    try:
        urllib.request.urlretrieve(direct, dst)
    except Exception as exc:  # zero-egress envs land here
        raise ConnectionError(
            f"{row['name']}: download failed ({exc}); fetch {url} manually "
            f"and pass --local-pth") from exc
    return dst


def build_row(row, args):
    """Config + model + init params for one manifest row."""
    from adapt_image_models_tpu.config import Config

    cfg = Config.fromfile(os.path.join(REPO, row["config"]))
    overrides = {str(k): v for k, v in (row.get("cfg_options") or {}).items()}
    for item in args.cfg_options:
        k, _, v = item.partition("=")
        overrides[k] = v
    if overrides:
        cfg.merge_from_dict(overrides)

    # the fused Pallas kernels are TPU-only; on a CPU host fall back to the
    # XLA core (same math — fused-vs-xla parity is covered by the op tests)
    import jax

    if jax.default_backend() == "cpu":
        cfg.merge_from_dict({"model.backbone.attention_core": "xla"})

    from adapt_image_models_tpu.apis.inference import init_recognizer

    model, params = init_recognizer(cfg.to_dict(), checkpoint=None, seed=0)
    return cfg, model, params


def check_params(row, params):
    import numpy as np
    import jax.tree_util as jtu

    from adapt_image_models_tpu.core.train_state import split_variables
    from adapt_image_models_tpu.parallel.partition import partition_params

    params, _ = split_variables(params)
    total_m = sum(int(np.prod(x.shape))
                  for x in jtu.tree_leaves(params)) / 1e6
    trainable, _ = partition_params(params)
    tunable_m = sum(int(np.prod(x.shape))
                    for x in jtu.tree_leaves(trainable)) / 1e6
    ok_total = abs(total_m - row["params_m"]) < 1.0
    ok_tun = abs(tunable_m - row["tunable_params_m"]) < 1.0
    return {"params_m": round(total_m, 2), "tunable_params_m": round(tunable_m, 2),
            "params_ok": bool(ok_total and ok_tun)}


def verify_row(row, args):
    import torch

    from adapt_image_models_tpu.convert.aim_import import (
        load_aim_checkpoint_into_params,
    )
    from adapt_image_models_tpu.core.train_state import split_variables

    cfg, model, params = build_row(row, args)
    verdict = {"name": row["name"], **check_params(row, params)}
    if args.param_check_only:
        return verdict

    path = resolve_checkpoint(row, args)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    bare, model_state = split_variables(params)
    bare = load_aim_checkpoint_into_params(bare, ckpt, strict=False)
    params = {"params": bare, **model_state} if model_state else bare

    from adapt_image_models_tpu.apis.test import run_evaluation

    results = run_evaluation(cfg.to_dict(), model=model, params=params,
                             split=args.split,
                             metrics=("top_k_accuracy",))
    top1 = 100.0 * results.get("top1_acc", 0.0)
    top5 = 100.0 * results.get("top5_acc", 0.0)
    verdict.update(top1=round(top1, 2), top5=round(top5, 2))
    expect = row.get("expect", {})
    ok = True
    if "top1" in expect:
        ok &= abs(top1 - expect["top1"]) <= args.tol
    if "top5" in expect:
        ok &= abs(top5 - expect["top5"]) <= args.tol
    verdict.update(expect=expect, accuracy_ok=bool(ok))
    return verdict


def main():
    args = parse_args()
    rows = load_manifest(args.manifest)
    if args.model:
        rows = [r for r in rows if r["name"] == args.model]
        if not rows:
            raise SystemExit(f"no manifest row named {args.model!r}")
    verdicts = []
    for row in rows:
        v = verify_row(row, args)
        verdicts.append(v)
        print(json.dumps(v))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(verdicts, f, indent=1)
    bad = [v["name"] for v in verdicts
           if not (v.get("params_ok", True)
                   and v.get("accuracy_ok", True))]
    if bad:
        raise SystemExit(f"verification FAILED for: {bad}")
    print(f"all {len(verdicts)} row(s) verified")


if __name__ == "__main__":
    main()
