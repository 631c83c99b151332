#!/usr/bin/env python
"""Backbone feature extraction over a dataset
(reference ``tools/misc/clip_feature_extraction.py:228``).

    python tools/misc/clip_feature_extraction.py <config> <out.npz> \
        [--checkpoint ckpt] [--split test]
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
    p.add_argument("out")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.apis.inference import init_recognizer
    from adapt_image_models_tpu.data.datasets import build_dataset
    from adapt_image_models_tpu.data.loader import VideoLoader
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    from adapt_image_models_tpu.data.transforms import make_prepare_fn

    from adapt_image_models_tpu.data.transforms import layout_from_pipeline

    cfg = Config.fromfile(args.config)
    from adapt_image_models_tpu.config.config import apply_cfg_options
    apply_cfg_options(cfg, args.cfg_options)
    model, params = init_recognizer(cfg.to_dict(), checkpoint=args.checkpoint)

    ds_cfg = dict(cfg["data"][args.split])
    pipeline = ds_cfg.pop("pipeline")
    dataset = build_dataset({**ds_cfg, "pipeline": pipeline})
    proc = build_sample_processor(pipeline)
    batch_size = args.batch
    if proc.num_views is None and batch_size != 1:
        # UntrimmedSampleFrames: per-video clip counts differ, a multi-video
        # batch cannot stack (reference runs this recipe at videos_per_gpu=1)
        print("untrimmed sampling: forcing --batch 1 (per-video clip counts "
              "differ)", file=sys.stderr)
        batch_size = 1
    loader = VideoLoader(dataset, proc, batch_size=batch_size, shuffle=False,
                         num_workers=4, drop_last=False)
    layout = layout_from_pipeline(pipeline)
    prepare = make_prepare_fn(proc.mean, proc.std, layout=layout)

    from adapt_image_models_tpu.core.train_state import as_variables

    def _pool(f):
        """Backbone output (map, vector or tuple of maps) -> (N, D)
        (reference feature_extraction branch: spatio-temporal avg pool +
        concat over multi-pathway tuples, recognizer3d.py:66-78)."""
        if isinstance(f, tuple):
            return jnp.concatenate([_pool(x) for x in f], axis=-1)
        if f.ndim > 2:
            f = f.mean(axis=tuple(range(1, f.ndim - 1)))
        return f

    if layout == "NCTHW":
        def _extract(p, v):  # (B, V, C, T, H, W) 3D contract
            b, nv = v.shape[:2]
            f = model.apply(as_variables(p), v.reshape((-1,) + v.shape[2:]),
                            method=model.extract_feat)
            return _pool(f).reshape(b, nv, -1).mean(axis=1)
    else:
        def _extract(p, v):  # (B, S, C, H, W) 2D segment contract
            f = model.apply(as_variables(p), v, method=model.extract_feat)
            return f.mean(axis=1)

    extract = jax.jit(_extract)

    feats, labels = [], []
    for batch in loader:
        views = prepare(jnp.asarray(batch["imgs"]))
        f = np.asarray(extract(params, views))  # (B, D)
        feats.append(f)
        labels.append(np.asarray(batch["label"]))
    feats = np.concatenate(feats)[:len(dataset)]
    labels = np.concatenate(labels)[:len(dataset)]
    np.savez(args.out, features=feats, labels=labels)
    print(f"saved {feats.shape} features -> {args.out}")


if __name__ == "__main__":
    main()
