#!/usr/bin/env python
"""Build the HVU multi-category annotation json from the official csv
(reference ``tools/data/hvu/generate_file_list.py``): per clip, tags are
mapped to per-category index lists using ``hvu_tags.json``."""

import argparse
import fnmatch
import glob
import json
import os
import os.path as osp


def parse_directory(path, rgb_prefix="img_", flow_x_prefix="flow_x_",
                    flow_y_prefix="flow_y_", level=1):
    """{video id: (path, rgb_num, flow_num)} for a rawframes tree."""
    if level == 1:
        frame_dirs = glob.glob(osp.join(path, "*"))
        locate = osp.basename
    elif level == 2:
        frame_dirs = glob.glob(osp.join(path, "*", "*"))
        def locate(x):
            return osp.join(osp.basename(osp.dirname(x)), osp.basename(x))
    else:
        raise ValueError("level can be only 1 or 2")

    frame_dict = {}
    for frame_dir in frame_dirs:
        lst = os.listdir(frame_dir)
        counts = [len(fnmatch.filter(lst, p + "*"))
                  for p in (rgb_prefix, flow_x_prefix, flow_y_prefix)]
        if counts[1] != counts[2]:
            raise ValueError("x and y direction have different numbers of "
                             f"flow images in {frame_dir}")
        frame_dict[locate(frame_dir)] = (frame_dir, counts[0], counts[1])
    return frame_dict


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
