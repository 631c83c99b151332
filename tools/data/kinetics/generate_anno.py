#!/usr/bin/env python
"""Generate ``<class_dir>/<video> <label>`` video lists by scanning
class-named directories (the fork's
``tools/data/kinetics/generate_anno.py``, paths made arguments)."""

import argparse
import os
import os.path as osp


def write_list(video_root, out_file):
    label_map = {}
    with open(out_file, "w") as f:
        for label, d in enumerate(sorted(os.listdir(video_root))):
            label_map[d] = label
            for name in sorted(os.listdir(osp.join(video_root, d))):
                f.write(f"{osp.join(d, name)} {label}\n")
    return label_map


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-path", required=True)
    p.add_argument("--val-path", required=True)
    p.add_argument("--train-out", default="train_video_list.txt")
    p.add_argument("--val-out", default="val_video_list.txt")
    args = p.parse_args()
    write_list(args.train_path, args.train_out)
    write_list(args.val_path, args.val_out)


if __name__ == "__main__":
    main()
