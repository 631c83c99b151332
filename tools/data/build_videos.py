#!/usr/bin/env python
"""Re-encode extracted frame directories back into videos (reference
``tools/data/build_videos.py`` — an ffmpeg-CLI wrapper; here OpenCV).

    python tools/data/build_videos.py FRAME_ROOT OUT_DIR \
        [--fps 30] [--level 2] [--start-idx 1] \
        [--filename-tmpl img_%05d.jpg] [--ext mp4]
"""

import argparse
import glob
import os
import os.path as osp
import sys
from multiprocessing import Pool


def build_one(task):
    import cv2
    frame_dir, dst, args = task
    os.makedirs(osp.dirname(dst), exist_ok=True)
    if args.resume and osp.exists(dst):
        return frame_dir, True
    frames = sorted(glob.glob(osp.join(frame_dir, "img_*")))
    if not frames:
        print(f"no frames under {frame_dir}", file=sys.stderr)
        return frame_dir, False
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(dst, cv2.VideoWriter_fourcc(*args.fourcc),
                             args.fps, (w, h))
    for fp in frames:
        img = cv2.imread(fp)
        if img is None:
            continue
        writer.write(img)
    writer.release()
    return frame_dir, True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src_dir", help="rawframes root")
    p.add_argument("out_dir")
    p.add_argument("--fps", type=float, default=30)
    p.add_argument("--level", type=int, default=2, choices=[1, 2])
    p.add_argument("--ext", default="mp4")
    p.add_argument("--fourcc", default="mp4v")
    p.add_argument("--num-worker", type=int, default=8)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    dirs = sorted(d for d in glob.glob(
        osp.join(args.src_dir, *("*",) * args.level)) if osp.isdir(d))
    print(f"{len(dirs)} frame directories under {args.src_dir}")
    tasks = []
    for d in dirs:
        rel = osp.relpath(d, args.src_dir) + "." + args.ext
        tasks.append((d, osp.join(args.out_dir, rel), args))
    with Pool(args.num_worker) as pool:
        results = pool.map(build_one, tasks)
    ok = sum(1 for _, good in results if good)
    print(f"done: {ok}/{len(dirs)} ok")


if __name__ == "__main__":
    main()
