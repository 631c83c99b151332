#!/usr/bin/env python
"""Standalone optical-flow extraction (reference
``tools/misc/flow_extraction.py`` — cv2-CUDA based; here Farneback on the
host CPU, same quantized flow_x/flow_y jpeg output convention as
``tools/data/build_rawframes.py --task flow``).

    python tools/misc/flow_extraction.py <video-or-dir> <out_dir> \
        [--bound 20] [--new-short 0] [--ext mp4]
"""

import argparse
import glob
import importlib.util
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def _load_rawframes_tool():
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "data", "build_rawframes.py")
    spec = importlib.util.spec_from_file_location("build_rawframes", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", help="a video file or a directory of videos")
    p.add_argument("out_dir")
    p.add_argument("--bound", type=float, default=20.0,
                   help="flow clip bound for uint8 quantization")
    p.add_argument("--new-short", type=int, default=0)
    p.add_argument("--ext", default="mp4")
    args = p.parse_args()

    tool = _load_rawframes_tool()
    tool.FLOW_BOUND = args.bound

    if osp.isdir(args.input):
        videos = sorted(glob.glob(osp.join(args.input, f"*.{args.ext}")))
    else:
        videos = [args.input]

    opts = type("A", (), dict(task="flow", new_short=args.new_short,
                              new_width=0, new_height=0, resume=False))()
    ok = 0
    for v in videos:
        name = osp.splitext(osp.basename(v))[0]
        _, n = tool.extract_one((v, osp.join(args.out_dir, name), opts))
        ok += int(n != 0)
        print(f"{v}: {n} frames")
    print(f"done: {ok}/{len(videos)} ok")


if __name__ == "__main__":
    main()
