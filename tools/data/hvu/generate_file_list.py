#!/usr/bin/env python
"""Build the HVU multi-category annotation json from the official csv
(reference ``tools/data/hvu/generate_file_list.py``): per clip, tags are
mapped to per-category index lists using ``hvu_tags.json``."""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from parse_file_list import parse_directory  # noqa: E402 — shared scanner


def main():
    p = argparse.ArgumentParser(description="build file list for HVU")
    p.add_argument("--input_csv", required=True)
    p.add_argument("--src_dir", required=True,
                   help="source video / frames directory")
    p.add_argument("--output", required=True, help="output .json filename")
    p.add_argument("--mode", required=True, choices=["frames", "videos"])
    p.add_argument("--tag-file", default="hvu_tags.json")
    args = p.parse_args()

    with open(args.tag_file) as f:
        tag_cates = json.load(f)
    tag2category = {tag: k for k in tag_cates for tag in tag_cates[k]}

    rows = [x.strip().split(",") for x in open(args.input_csv).readlines()[1:]]

    if args.mode == "videos":
        downloaded_set = {x.split(".")[0] for x in os.listdir(args.src_dir)}
        parse_result = {}
    else:
        parse_result = parse_directory(args.src_dir)
        downloaded_set = set(parse_result)

    def parse_line(line):
        tags, youtube_id, start, end = line
        start, end = int(float(start) * 10), int(float(end) * 10)
        newname = f"{youtube_id}_{start:06d}_{end:06d}"
        all_tags = {}
        for tag in tags.split("|"):
            category = tag2category[tag]
            all_tags.setdefault(category, []).append(
                tag_cates[category].index(tag))
        return newname, all_tags

    data_list = [parse_line(line) for line in rows]
    data_list = [x for x in data_list if x[0] in downloaded_set]

    if args.mode == "frames":
        result = [dict(frame_dir=name, total_frames=parse_result[name][1],
                       label=tags) for name, tags in data_list]
    else:
        result = [dict(filename=name + ".mp4", label=tags)
                  for name, tags in data_list]
    with open(args.output, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
