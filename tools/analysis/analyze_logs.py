#!/usr/bin/env python
"""Training-log analysis (reference ``tools/analysis/analyze_logs.py``).

Parses our trainer's ``train.log`` lines
(``Epoch [e][i/n] lr: .. loss: .. top1: ..``) and reports per-epoch stats
or dumps json. Plotting is optional (matplotlib if available).

    python tools/analysis/analyze_logs.py cal_train_time <log>
    python tools/analysis/analyze_logs.py plot_curve <log> --keys loss top1
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

LINE_RE = re.compile(
    r"Epoch \[(\d+)\]\[(\d+)/(\d+)\].*?lr: ([\d.eE+-]+) "
    r"loss: ([\d.eE+-]+) top1: ([\d.eE+-]+) top5: ([\d.eE+-]+)"
    r"(?: clips/s: ([\d.eE+-]+))?")


def parse_log(path):
    rows = []
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if m:
                rows.append(dict(
                    epoch=int(m.group(1)), iter=int(m.group(2)),
                    total_iters=int(m.group(3)), lr=float(m.group(4)),
                    loss=float(m.group(5)), top1=float(m.group(6)),
                    top5=float(m.group(7)),
                    clips_per_s=float(m.group(8)) if m.group(8) else None))
    return rows


def cal_train_time(rows):
    by_epoch = defaultdict(list)
    for r in rows:
        if r["clips_per_s"]:
            by_epoch[r["epoch"]].append(r["clips_per_s"])
    for e in sorted(by_epoch):
        v = by_epoch[e]
        print(f"epoch {e}: mean {sum(v) / len(v):.1f} clips/s over {len(v)} logs")


def plot_curve(rows, keys, out):
    series = {k: [(i, r[k]) for i, r in enumerate(rows) if r.get(k) is not None]
              for k in keys}
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for k, pts in series.items():
            plt.plot([p[0] for p in pts], [p[1] for p in pts], label=k)
        plt.legend()
        plt.xlabel("log step")
        plt.savefig(out or "curves.png")
        print(f"saved {out or 'curves.png'}")
    except ImportError:
        print(json.dumps({k: v[-5:] for k, v in series.items()}, indent=1))
        print("(matplotlib unavailable; printed the last 5 points per key)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["cal_train_time", "plot_curve", "dump_json"])
    p.add_argument("log")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default=None)
    args = p.parse_args()
    rows = parse_log(args.log)
    if not rows:
        print("no parseable log lines found")
        sys.exit(1)
    if args.task == "cal_train_time":
        cal_train_time(rows)
    elif args.task == "plot_curve":
        plot_curve(rows, args.keys, args.out)
    else:
        print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
