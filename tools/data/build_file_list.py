#!/usr/bin/env python
"""Annotation file-list builder (reference ``tools/data/build_file_list.py``).

Scans ``<root>/<class_name>/<video>`` layout (the standard K400/UCF101/HMDB51
download structure) and writes ``<relpath> <label>`` lists plus a
``classes.txt`` index. Split by ratio or by an existing official split file.

    python tools/data/build_file_list.py <video_root> <out_dir> \
        [--val-ratio 0.1] [--ext mp4 avi mkv webm] [--level 2]
"""

import argparse
import os
import random
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("out_dir")
    p.add_argument("--ext", nargs="+", default=["mp4", "avi", "mkv", "webm"])
    p.add_argument("--val-ratio", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rawframes", action="store_true",
                   help="frame-dir layout: writes '<dir> <num_frames> <label>'")
    args = p.parse_args()

    root = os.path.abspath(args.root)
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        print(f"no class directories under {root}")
        sys.exit(1)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "classes.txt"), "w") as f:
        f.write("\n".join(classes))

    entries = []
    exts = tuple("." + e.lstrip(".") for e in args.ext)
    for label, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for name in sorted(os.listdir(cdir)):
            path = os.path.join(cdir, name)
            if args.rawframes and os.path.isdir(path):
                n = len([x for x in os.listdir(path)
                         if x.lower().endswith((".jpg", ".jpeg", ".png"))])
                if n:
                    entries.append(f"{cls}/{name} {n} {label}")
            elif name.lower().endswith(exts):
                entries.append(f"{cls}/{name} {label}")

    rng = random.Random(args.seed)
    rng.shuffle(entries)
    n_val = int(len(entries) * args.val_ratio)
    val, train = entries[:n_val], entries[n_val:]
    prefix = "rawframe" if args.rawframes else "video"
    with open(os.path.join(args.out_dir, f"train_{prefix}_list.txt"), "w") as f:
        f.write("\n".join(sorted(train)))
    if n_val:
        with open(os.path.join(args.out_dir, f"val_{prefix}_list.txt"), "w") as f:
            f.write("\n".join(sorted(val)))
    print(f"{len(classes)} classes, {len(train)} train / {len(val)} val -> "
          f"{args.out_dir}")


if __name__ == "__main__":
    main()
