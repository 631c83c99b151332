#!/usr/bin/env python
"""Download ActivityNet videos listed in the BSN/BMN annotation files
(reference ``tools/data/activitynet/download.py``). Requires
yt_dlp/youtube_dl."""

import argparse
import json
import os
import os.path as osp
import sys
from multiprocessing.pool import ThreadPool

sys.path.insert(0, osp.dirname(osp.abspath(__file__)) + "/..")
from _download import youtube_download  # noqa: E402


def parse_ids(anno_file, video_info_csv=None):
    """video ids ('v_XXXXXXXXXXX') from the anet annotation json (or the
    BSN video_info csv when given)."""
    if video_info_csv:
        lines = open(video_info_csv).readlines()[1:]
        return [x.strip().split(",")[0] for x in lines]
    with open(anno_file) as f:
        return sorted(json.load(f))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--anno-file",
                   default="data/ActivityNet/anet_anno_action.json")
    p.add_argument("--video-info", default=None,
                   help="BSN video_info_new.csv (overrides --anno-file)")
    p.add_argument("--output-dir", default="data/ActivityNet/videos")
    p.add_argument("-n", "--num-jobs", type=int, default=24)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    ids = parse_ids(args.anno_file, args.video_info)

    def one(name):
        vid = name[2:] if name.startswith("v_") else name  # strip 'v_'
        return (name, *youtube_download(
            vid, osp.join(args.output_dir, name + ".mp4")))
    with ThreadPool(args.num_jobs) as pool:
        report = list(pool.map(one, ids))
    with open("download_report.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
