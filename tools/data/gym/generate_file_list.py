#!/usr/bin/env python
"""Generate FineGYM-99 train/val file lists from the downloaded subaction
clips (reference ``tools/data/gym/generate_file_list.py``)."""

import argparse
import os
import os.path as osp


def convert(org_file, out_file, frame_file, videos, frame_data_root):
    lines = [x.strip().split() for x in open(org_file)]
    kept = [x for x in lines if x[0] + ".mp4" in videos]
    if osp.exists(frame_data_root):
        frame_lines = []
        for line in kept:
            length = len(os.listdir(osp.join(frame_data_root, line[0])))
            # rawframe dirs hold img/flow_x/flow_y triplets
            frame_lines.append(f"{line[0]} {length // 3} {line[1]}")
        with open(frame_file, "w") as f:
            f.write("\n".join(frame_lines))
    with open(out_file, "w") as f:
        f.write("\n".join(f"{x[0]}.mp4 {x[1]}" for x in kept))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/gym")
    args = p.parse_args()
    anno = f"{args.data_root}/annotations"
    videos = set(os.listdir(f"{args.data_root}/subactions"))
    frames = f"{args.data_root}/subaction_frames"
    for split in ("train", "val"):
        convert(f"{anno}/gym99_{split}_org.txt",
                f"{anno}/gym99_{split}.txt",
                f"{anno}/gym99_{split}_frame.txt", videos, frames)


if __name__ == "__main__":
    main()
