#!/usr/bin/env python
"""Split the ActivityNet annotation json into train/val/test/full localizer
annotation files, attaching fps/rfps from the BSN video-info csv
(reference ``tools/data/activitynet/process_annotations.py``)."""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/ActivityNet")
    args = p.parse_args()
    info_file = f"{args.data_root}/video_info_new.csv"
    ann_file = f"{args.data_root}/anet_anno_action.json"

    with open(ann_file) as f:
        anno_database = json.load(f)

    subsets = {"training": {}, "validation": {}, "testing": {}}
    full = {}
    rows = [x.strip().split(",") for x in open(info_file).readlines()[1:]]
    for row in rows:
        video_name, subset, fps, rfps = row[0], row[5], row[3], row[4]
        video_info = anno_database[video_name]
        video_info["fps"] = float(fps)
        video_info["rfps"] = float(rfps)
        full[video_name] = video_info
        if subset in subsets:
            subsets[subset][video_name] = video_info

    print(f"full subset video numbers: {len(rows)}")
    for name, out in (("train", subsets["training"]),
                      ("val", subsets["validation"]),
                      ("test", subsets["testing"]), ("full", full)):
        with open(f"{args.data_root}/anet_anno_{name}.json", "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
