#!/usr/bin/env python
"""Re-encode videos to a target short side (reference
``tools/data/resize_video.py`` — an ffmpeg-CLI wrapper; here OpenCV
decodes+encodes so no external binary is required).

    python tools/data/resize_video.py SRC_DIR OUT_DIR \
        [--dense] [--level 2] [--ext mp4] [--scale 256] [--num-worker 8]

``--dense`` halves the output FPS cap at 30 like the reference's
``-r 30`` path (useful for very high-fps sources).
"""

import argparse
import glob
import os
import os.path as osp
import sys
from multiprocessing import Pool


def resize_one(task):
    import cv2
    src, dst, args = task
    os.makedirs(osp.dirname(dst), exist_ok=True)
    if args.resume and osp.exists(dst):
        return src, True
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        print(f"FAILED to open {src}", file=sys.stderr)
        return src, False
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    if args.dense and fps > 30:
        fps = 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    ss = args.scale
    if min(h, w) <= ss:
        ow, oh = w, h
    elif h < w:
        ow, oh = int(round(w * ss / h)), ss
    else:
        ow, oh = ss, int(round(h * ss / w))
    ow, oh = ow // 2 * 2, oh // 2 * 2  # even dims for most codecs
    writer = cv2.VideoWriter(dst, cv2.VideoWriter_fourcc(*args.fourcc),
                             fps, (ow, oh))
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if (ow, oh) != (w, h):
            frame = cv2.resize(frame, (ow, oh),
                               interpolation=cv2.INTER_LINEAR)
        writer.write(frame)
    cap.release()
    writer.release()
    return src, True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src_dir")
    p.add_argument("out_dir")
    p.add_argument("--dense", action="store_true")
    p.add_argument("--level", type=int, default=2, choices=[1, 2])
    p.add_argument("--ext", default="mp4")
    p.add_argument("--to-ext", default=None,
                   help="output extension (default: same as --ext)")
    p.add_argument("--fourcc", default="mp4v")
    p.add_argument("--scale", type=int, default=256,
                   help="target short side")
    p.add_argument("--num-worker", type=int, default=8)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    pattern = osp.join(args.src_dir, *("*",) * args.level) + "." + args.ext
    videos = sorted(glob.glob(pattern))
    print(f"{len(videos)} videos under {args.src_dir}")
    to_ext = args.to_ext or args.ext
    tasks = []
    for v in videos:
        rel = osp.splitext(osp.relpath(v, args.src_dir))[0] + "." + to_ext
        tasks.append((v, osp.join(args.out_dir, rel), args))
    with Pool(args.num_worker) as pool:
        results = pool.map(resize_one, tasks)
    ok = sum(1 for _, good in results if good)
    print(f"done: {ok}/{len(videos)} ok")


if __name__ == "__main__":
    main()
