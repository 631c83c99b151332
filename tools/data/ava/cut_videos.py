"""Cut each AVA video to its 15th-30th minute (reference
``tools/data/ava/cut_videos.sh`` — ``ffmpeg -ss 900 -t 901``; this image
has no ffmpeg CLI, so clips re-encode through the in-repo trim helper)."""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from _trim import trim_video  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src_dir")
    parser.add_argument("out_dir")
    parser.add_argument("--start", type=float, default=900.0)
    parser.add_argument("--duration", type=float, default=901.0)
    parser.add_argument("--fps", type=float, default=30.0)
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in sorted(os.listdir(args.src_dir)):
        src = osp.join(args.src_dir, name)
        dst = osp.join(args.out_dir, osp.splitext(name)[0] + ".mp4")
        if osp.exists(dst):
            continue
        ok = trim_video(src, dst, args.start, args.duration, fps=args.fps)
        print(("ok   " if ok else "FAIL ") + name, flush=True)


if __name__ == "__main__":
    main()
