#!/usr/bin/env python
"""Webcam spatio-temporal action detection demo (reference
``demo/webcam_demo_spatiotemporal_det.py``): grab frames from a capture
device, detect persons on key frames (OpenCV HOG — the reference drives an
mmdet Faster R-CNN), score their actions with a FastRCNN AVA detector, and
display/write annotated frames.

    python demo/webcam_demo_spatiotemporal_det.py <config> \
        [--checkpoint ckpt] [--camera 0 | --input video.mp4] \
        [--out out.mp4] [--label-map ava_labels.txt] \
        [--predict-stepsize 8] [--action-thr 0.4] [--max-seconds 30]
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
    p.add_argument("--camera", type=int, default=0)
    p.add_argument("--input", default=None,
                   help="video file standing in for the camera")
    p.add_argument("--out", default=None, help="write annotated mp4 here")
    p.add_argument("--label-map", default=None)
    p.add_argument("--predict-stepsize", type=int, default=8)
    p.add_argument("--action-thr", type=float, default=0.4)
    p.add_argument("--max-boxes", type=int, default=5)
    p.add_argument("--max-seconds", type=float, default=30.0)
    p.add_argument("--display", action="store_true",
                   help="cv2.imshow live window (needs a display)")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp

    from adapt_image_models_tpu.config import Config
    from adapt_image_models_tpu.config.config import apply_cfg_options
    from adapt_image_models_tpu.models import build_model

    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, test_cfg=test_cfg)

    pipeline = cfg["data"]["val"]["pipeline"]
    samp = next(s for s in pipeline if s["type"] == "SampleAVAFrames")
    clip_len, interval = samp["clip_len"], samp.get("frame_interval", 2)
    size = 256
    span = clip_len * interval

    r = args.max_boxes
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, clip_len, size, size)),
                           jnp.zeros((1, r, 4)))
    if args.checkpoint:
        from adapt_image_models_tpu.core.checkpoint import (
            CheckpointManager, checkpoint_tag,
        )
        ckpt = os.path.normpath(args.checkpoint)
        mgr = CheckpointManager(os.path.dirname(ckpt) or ".")
        variables = mgr.restore_variables(checkpoint_tag(ckpt))
    fwd = jax.jit(lambda v, x, b: model.apply(v, x, b))

    # headless cv2 builds may lack objdetect; fall back to one full-frame
    # box (a webcam subject fills the frame) with a visible warning
    try:
        hog = cv2.HOGDescriptor()
        hog.setSVMDetector(cv2.HOGDescriptor_getDefaultPeopleDetector())
    except AttributeError:
        hog = None
        print("warning: cv2 lacks HOGDescriptor — using one full-frame "
              "person box per keyframe")

    labels = None
    if args.label_map:
        with open(args.label_map) as f:
            labels = [ln.strip() for ln in f if ln.strip()]

    cap = cv2.VideoCapture(args.input if args.input else args.camera)
    if not cap.isOpened():
        raise IOError("cannot open capture device / input video")
    fps = float(cap.get(cv2.CAP_PROP_FPS) or 15.0)
    writer = None

    buf = collections.deque(maxlen=span)
    t0 = time.time()
    i = 0
    current = None
    while time.time() - t0 < args.max_seconds:
        ok, bgr = cap.read()
        if not ok:
            break
        buf.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        h0, w0 = bgr.shape[:2]
        if writer is None and args.out:
            writer = cv2.VideoWriter(args.out,
                                     cv2.VideoWriter_fourcc(*"mp4v"),
                                     fps, (w0, h0))
        if i % args.predict_stepsize == 0 and len(buf) == span:
            if hog is not None:
                rects, _ = hog.detectMultiScale(bgr, winStride=(8, 8))
                boxes = np.array([[x, y, x + w, y + h]
                                  for x, y, w, h in rects],
                                 np.float32).reshape(-1, 4)[:r]
            else:
                boxes = np.array([[0, 0, w0 - 1, h0 - 1]], np.float32)
            if len(boxes):
                clip = np.stack(list(buf))[::interval][-clip_len:]
                clip = np.stack([cv2.resize(f, (size, size))
                                 for f in clip]).astype(np.float32)
                clip = (clip - 127.5) / 58.0
                x = clip.transpose(3, 0, 1, 2)[None]
                rois = np.zeros((1, r, 4), np.float32)
                sx, sy = size / w0, size / h0
                rois[0, :len(boxes)] = boxes * np.array([sx, sy, sx, sy])
                logits = np.asarray(fwd(variables, jnp.asarray(x),
                                        jnp.asarray(rois)))[0]
                scores = 1 / (1 + np.exp(-logits))
                current = (boxes, scores[:len(boxes)])
            else:
                current = None
        if current is not None:
            for box, sc in zip(*current):
                x1, y1, x2, y2 = box.astype(int)
                cv2.rectangle(bgr, (x1, y1), (x2, y2), (0, 255, 0), 2)
                shown = 0
                for k in np.argsort(sc)[::-1]:
                    if sc[k] < args.action_thr or shown >= 3:
                        break
                    name = labels[k] if labels and k < len(labels) else str(k)
                    cv2.putText(bgr, f"{name}: {sc[k]:.2f}",
                                (x1, max(12, y1 - 6 - 14 * shown)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                                (0, 255, 0), 1)
                    shown += 1
        if writer is not None:
            writer.write(bgr)
        if args.display:
            cv2.imshow("aim spatiotemporal", bgr)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        i += 1
    cap.release()
    if writer is not None:
        writer.release()
        print(f"wrote {args.out}: {i} frames")


if __name__ == "__main__":
    main()
