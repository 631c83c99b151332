#!/usr/bin/env python
"""Merge + temporally pool per-video RGB/Flow TSN features into the 100-bin
400-d csv features BSN/BMN consume (reference
``tools/data/activitynet/activitynet_feature_postprocessing.py``)."""

import argparse
import multiprocessing
import os
import os.path as osp
import pickle

import numpy as np

args = None


def _interp1d(data: np.ndarray):
    x = np.arange(len(data), dtype=np.float64)

    def f(x_new):
        x_new = np.asarray(x_new, np.float64)
        i = np.clip(np.searchsorted(x, x_new) - 1, 0, len(x) - 2)
        w = (x_new - x[i]) / (x[i + 1] - x[i])
        return (1 - w)[:, None] * data[i] + w[:, None] * data[i + 1]
    return f


def pool_feature(data, num_proposals=100, num_sample_bins=3,
                 pool_type="mean"):
    """(T, C) features of arbitrary T -> (num_proposals, C) by linear
    interpolation + per-anchor mean/max pooling."""
    data = np.asarray(data)
    if len(data) == 1:
        return np.concatenate([data] * num_proposals)
    f = _interp1d(data)
    eps = 1e-4
    start, end = eps, len(data) - 1 - eps
    anchor_size = (end - start) / num_proposals
    ptr = start
    feature = []
    for _ in range(num_proposals):
        x_new = [ptr + i / num_sample_bins * anchor_size
                 for i in range(num_sample_bins)]
        y_new = f(x_new)
        y_new = (np.mean(y_new, axis=0) if pool_type == "mean"
                 else np.max(y_new, axis=0))
        feature.append(y_new)
        ptr += anchor_size
    return np.stack(feature)


def merge_feat(name):
    with open(osp.join(args.rgb, name), "rb") as f:
        rgb_feat = pool_feature(pickle.load(f))
    with open(osp.join(args.flow, name), "rb") as f:
        flow_feat = pool_feature(pickle.load(f))
    feat = np.concatenate([rgb_feat, flow_feat], axis=-1)
    os.makedirs(args.dest, exist_ok=True)
    if args.output_format == "pkl":
        with open(osp.join(args.dest, name), "wb") as f:
            pickle.dump(feat, f)
    else:
        lines = [",".join(f"f{i}" for i in range(feat.shape[1]))]
        lines += [",".join(f"{x:.4f}" for x in row) for row in feat]
        out = osp.join(args.dest, name.replace(".pkl", ".csv"))
        with open(out, "w") as f:
            f.write("\n".join(lines))


def main():
    global args
    p = argparse.ArgumentParser(description="ANet Feature Prepare")
    p.add_argument("--rgb", default="", help="rgb feature root")
    p.add_argument("--flow", default="", help="flow feature root")
    p.add_argument("--dest", default="", help="dest root")
    p.add_argument("--output-format", default="csv",
                   choices=["csv", "pkl"])
    p.add_argument("--num-workers", type=int, default=8)
    args = p.parse_args()
    rgb_feat = os.listdir(args.rgb)
    flow_feat = os.listdir(args.flow)
    assert set(rgb_feat) == set(flow_feat)
    if args.num_workers <= 1:  # in-process (fork deadlocks under jax)
        for name in rgb_feat:
            merge_feat(name)
    else:
        with multiprocessing.Pool(args.num_workers) as pool:
            pool.map(merge_feat, rgb_feat)


if __name__ == "__main__":
    main()
