#!/usr/bin/env python
"""GradCAM visualization demo (reference ``demo/demo_gradcam.py``).

    python demo/demo_gradcam.py <config> <video> [--checkpoint ckpt] \
        [--out cam.npz] [--target-class K]
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
    p.add_argument("--out", default="gradcam.npz")
    p.add_argument("--target-class", type=int, default=None)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.config.config import apply_cfg_options
    from adapt_image_models_tpu.apis.inference import init_recognizer
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    from adapt_image_models_tpu.data.transforms import make_prepare_fn
    from adapt_image_models_tpu.utils.gradcam import gradcam

    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)
    model, params = init_recognizer(cfg.to_dict(), checkpoint=args.checkpoint)
    proc = build_sample_processor(cfg["data"]["test"]["pipeline"])
    clips, _ = proc(args.video, label=0)
    prepare = make_prepare_fn(proc.mean, proc.std)
    imgs = prepare(jnp.asarray(clips[None]))[:, 0]  # first view (B,C,T,H,W)

    cam, scores = gradcam(model, params, imgs, target_class=args.target_class)
    top = int(np.asarray(scores)[0].argmax())
    np.savez(args.out, cam=np.asarray(cam), scores=np.asarray(scores),
             frames=clips[0])
    print(f"top-1 class {top} (p={float(np.asarray(scores)[0, top]):.4f}); "
          f"CAM {tuple(cam.shape)} saved to {args.out}")


if __name__ == "__main__":
    main()
