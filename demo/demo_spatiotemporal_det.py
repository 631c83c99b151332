#!/usr/bin/env python
"""Spatio-temporal action detection demo (reference
``demo/demo_spatiotemporal_det.py``): detect persons on key frames, score
their actions with a FastRCNN AVA detector, and write an annotated video.

The reference drives an mmdet Faster R-CNN for the person boxes; here the
default proposal source is OpenCV's HOG pedestrian detector (host CPU, no
extra deps) and ``--proposals`` accepts a pickle of precomputed boxes
``{frame_idx: (N, 4) xyxy in pixels}`` (e.g. AVA dense proposals) for
quality parity with the reference setup.

    python demo/demo_spatiotemporal_det.py <config> <video> out.mp4 \
        [--checkpoint ckpt] [--label-map ava_labels.txt] \
        [--predict-stepsize 8] [--action-thr 0.4] [--proposals boxes.pkl]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()


def detect_persons_hog(frames, every):
    """{keyframe_idx: (N, 4) xyxy} via OpenCV HOG (fallback detector)."""
    import cv2
    import numpy as np
    hog = cv2.HOGDescriptor()
    hog.setSVMDetector(cv2.HOGDescriptor_getDefaultPeopleDetector())
    out = {}
    for i in range(0, len(frames), every):
        bgr = cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR)
        rects, _ = hog.detectMultiScale(bgr, winStride=(8, 8))
        boxes = np.array([[x, y, x + w, y + h] for x, y, w, h in rects],
                         np.float32).reshape(-1, 4)
        out[i] = boxes
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("video")
    p.add_argument("out")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--label-map", default=None)
    p.add_argument("--predict-stepsize", type=int, default=8,
                   help="keyframe stride in frames")
    p.add_argument("--action-thr", type=float, default=0.4)
    p.add_argument("--max-boxes", type=int, default=5)
    p.add_argument("--proposals", default=None,
                   help="pickle {frame_idx: (N,4) xyxy} person boxes")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp

    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.config.config import apply_cfg_options
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.data.video_reader import open_video

    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)

    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, test_cfg=test_cfg)

    # clip geometry from the val pipeline's SampleAVAFrames
    pipeline = cfg["data"]["val"]["pipeline"]
    samp = next(s for s in pipeline if s["type"] == "SampleAVAFrames")
    clip_len, interval = samp["clip_len"], samp.get("frame_interval", 2)
    size = 256

    reader = open_video(args.video)
    n = reader.num_frames
    fps = float(getattr(reader, "avg_fps", 0) or getattr(reader, "fps", 0)
                or 30.0)
    frames = reader.get_frames(list(range(n)))  # (N, H, W, 3) RGB
    reader.close()
    h0, w0 = frames.shape[1:3]

    if args.proposals:
        with open(args.proposals, "rb") as f:
            proposals = pickle.load(f)
    else:
        proposals = detect_persons_hog(frames, args.predict_stepsize)

    labels = None
    if args.label_map:
        with open(args.label_map) as f:
            labels = [ln.strip() for ln in f if ln.strip()]

    # init once with the real clip shape
    r = args.max_boxes
    x0 = jnp.zeros((1, 3, clip_len, size, size))
    rois0 = jnp.zeros((1, r, 4))
    variables = model.init(jax.random.PRNGKey(0), x0, rois0)
    if args.checkpoint:
        from adapt_image_models_tpu.core.checkpoint import (
            CheckpointManager, checkpoint_tag,
        )
        ckpt = os.path.normpath(args.checkpoint)
        mgr = CheckpointManager(os.path.dirname(ckpt) or ".")
        variables = mgr.restore_variables(checkpoint_tag(ckpt))
    fwd = jax.jit(lambda v, x, b: model.apply(v, x, b))

    annos = {}
    sx, sy = size / w0, size / h0
    for key, boxes in sorted(proposals.items()):
        if len(boxes) == 0:
            continue
        boxes = np.asarray(boxes, np.float32)[:r]
        # clip centered on the keyframe
        inds = key + interval * (np.arange(clip_len) - clip_len // 2)
        inds = np.clip(inds, 0, n - 1)
        clip = frames[inds].astype(np.float32)
        clip = np.stack([cv2.resize(f, (size, size)) for f in clip])
        clip = (clip - 127.5) / 58.0
        x = clip.transpose(3, 0, 1, 2)[None]  # (1, 3, T, S, S)
        rois = np.zeros((1, args.max_boxes, 4), np.float32)
        rois[0, :len(boxes)] = boxes * np.array([sx, sy, sx, sy])
        logits = np.asarray(fwd(variables, jnp.asarray(x),
                                jnp.asarray(rois)))[0]
        scores = 1 / (1 + np.exp(-logits))  # multi-label sigmoid
        annos[key] = (boxes, scores[:len(boxes)])

    # render at the source frame rate
    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w0, h0))
    current = None
    for i in range(n):
        if i in annos:
            current = annos[i]
        bgr = cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR).copy()
        if current is not None:
            for box, sc in zip(*current):
                x1, y1, x2, y2 = box.astype(int)
                cv2.rectangle(bgr, (x1, y1), (x2, y2), (0, 255, 0), 2)
                top = np.argsort(sc)[::-1]
                shown = 0
                for k in top:
                    if sc[k] < args.action_thr or shown >= 3:
                        break
                    name = labels[k] if labels and k < len(labels) else str(k)
                    cv2.putText(bgr, f"{name}: {sc[k]:.2f}",
                                (x1, max(12, y1 - 6 - 14 * shown)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                                (0, 255, 0), 1)
                    shown += 1
        writer.write(bgr)
    writer.release()
    print(f"wrote {args.out}: {n} frames, "
          f"{len(annos)} annotated keyframes")


if __name__ == "__main__":
    main()
