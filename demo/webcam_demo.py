#!/usr/bin/env python
"""Webcam / capture-device demo (reference ``demo/webcam_demo.py``):
continuously grabs frames, keeps a rolling clip buffer, prints top-1.

    python demo/webcam_demo.py <config> [--checkpoint ckpt] [--device 0] \
        [--label-map classes.txt] [--max-seconds 30]
"""

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--device", type=int, default=0)
    p.add_argument("--label-map", default=None)
    p.add_argument("--max-seconds", type=float, default=30.0)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.config.config import apply_cfg_options
    from adapt_image_models_tpu.apis.inference import init_recognizer
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    from adapt_image_models_tpu.data.transforms import make_prepare_fn
    from adapt_image_models_tpu.data import transforms_host as TH

    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)
    model, params = init_recognizer(cfg.to_dict(), checkpoint=args.checkpoint)
    proc = build_sample_processor(cfg["data"]["test"]["pipeline"])
    t = proc.sampler.clip_len
    h, w = proc.output_size()
    prepare = make_prepare_fn(proc.mean, proc.std)
    from adapt_image_models_tpu.core.train_state import as_variables
    fwd = jax.jit(lambda pr, v: jax.nn.softmax(
        model.apply(as_variables(pr), v), axis=-1))
    labels = ([l.strip() for l in open(args.label_map)]
              if args.label_map else None)

    cap = cv2.VideoCapture(args.device)
    if not cap.isOpened():
        print(f"cannot open capture device {args.device}")
        sys.exit(1)
    buf = collections.deque(maxlen=t)
    t0 = time.time()
    try:
        while time.time() - t0 < args.max_seconds:
            ok, frame = cap.read()
            if not ok:
                break
            buf.append(frame[:, :, ::-1])
            if len(buf) < t:
                continue
            clip = np.stack(buf)
            clip = TH.rescale_short_side(clip, max(h, w))
            bbox = TH.center_crop_bbox(clip.shape[1:3], (w, h))
            clip = TH.resize_clip(TH.crop_clip(clip, bbox), (w, h))
            x = prepare(jnp.asarray(clip[None, None]))[:, 0]
            probs = np.asarray(fwd(params, x))[0]
            top = int(probs.argmax())
            name = labels[top] if labels and top < len(labels) else str(top)
            print(f"\r{name} ({probs[top]:.3f})", end="", flush=True)
    finally:
        cap.release()
        print()


if __name__ == "__main__":
    main()
