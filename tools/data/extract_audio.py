#!/usr/bin/env python
"""Extract audio tracks from videos to WAV (reference
``tools/data/extract_audio.py`` — an ffmpeg-CLI wrapper; here the in-repo
C++ library (csrc/aimaudio.cpp) decodes + resamples natively).

    python tools/data/extract_audio.py ROOT DST_ROOT \
        [--level 2] [--ext mp4] [--sample-rate 16000] [--stereo] \
        [--num-worker 8]
"""

import argparse
import glob
import os
import os.path as osp
import sys
from multiprocessing import Pool

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def extract_one(task):
    src, dst, args = task
    from adapt_image_models_tpu.data.cpp_decoder import extract_audio
    os.makedirs(osp.dirname(dst), exist_ok=True)
    if osp.exists(dst):
        return src, True
    try:
        extract_audio(src, dst, sample_rate=args.sample_rate,
                      mono=not args.stereo)
        return src, True
    except Exception as e:  # noqa: BLE001 — per-video isolation
        print(f"FAILED {src}: {e}", file=sys.stderr)
        with open("extract_wav_err_file.txt", "a+") as f:
            f.write(src + "\n")
        return src, False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", help="source video directory")
    p.add_argument("dst_root", help="output audio directory")
    p.add_argument("--level", type=int, default=2, choices=[1, 2])
    p.add_argument("--ext", default="mp4")
    p.add_argument("--sample-rate", type=int, default=16000,
                   help="0 keeps the source rate")
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--num-worker", type=int, default=8)
    args = p.parse_args()

    pattern = osp.join(args.root, *("*",) * args.level) + "." + args.ext
    videos = sorted(glob.glob(pattern))
    print(f"{len(videos)} videos under {args.root}")
    tasks = []
    for v in videos:
        rel = osp.splitext(osp.relpath(v, args.root))[0] + ".wav"
        tasks.append((v, osp.join(args.dst_root, rel), args))
    with Pool(args.num_worker) as pool:
        results = pool.map(extract_one, tasks)
    ok = sum(1 for _, good in results if good)
    print(f"done: {ok}/{len(videos)} ok")


if __name__ == "__main__":
    main()
