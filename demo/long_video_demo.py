#!/usr/bin/env python
"""Sliding-window inference over a long video
(reference ``demo/long_video_demo.py``).

    python demo/long_video_demo.py <config> <video> [--checkpoint ckpt] \
        [--stride-sec 1.0] [--label-map classes.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("video")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--stride-sec", type=float, default=1.0)
    p.add_argument("--label-map", default=None)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.config.config import apply_cfg_options
    from adapt_image_models_tpu.apis.inference import init_recognizer
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    from adapt_image_models_tpu.data.transforms import make_prepare_fn
    from adapt_image_models_tpu.data.video_reader import open_video
    from adapt_image_models_tpu.data import transforms_host as TH

    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)
    model, params = init_recognizer(cfg.to_dict(), checkpoint=args.checkpoint)
    proc = build_sample_processor(cfg["data"]["test"]["pipeline"])
    t = proc.sampler.clip_len
    interval = proc.sampler.frame_interval
    h, w = proc.output_size()
    prepare = make_prepare_fn(proc.mean, proc.std)
    from adapt_image_models_tpu.core.train_state import as_variables
    fwd = jax.jit(lambda pr, v: jax.nn.softmax(
        model.apply(as_variables(pr), v), axis=-1))

    labels = ([l.strip() for l in open(args.label_map)]
              if args.label_map else None)

    reader = open_video(args.video)
    fps = reader.avg_fps
    window = t * interval
    stride = max(1, int(args.stride_sec * fps))
    for start in range(0, max(1, reader.num_frames - window), stride):
        inds = [min(start + i * interval, reader.num_frames - 1)
                for i in range(t)]
        clip = reader.get_frames(inds)
        clip = TH.rescale_short_side(clip, max(h, w))
        bbox = TH.center_crop_bbox(clip.shape[1:3], (w, h))
        clip = TH.crop_clip(clip, bbox)
        clip = TH.resize_clip(clip, (w, h))
        x = prepare(jnp.asarray(clip[None, None]))[:, 0]
        probs = np.asarray(fwd(params, x))[0]
        top = int(probs.argmax())
        name = labels[top] if labels and top < len(labels) else str(top)
        print(f"t={start / fps:7.2f}s  {name}  ({probs[top]:.3f})")
    reader.close()


if __name__ == "__main__":
    main()
