#!/usr/bin/env python
"""Download FineGYM raw videos from the annotation json (reference
``tools/data/gym/download.py``). Requires yt_dlp/youtube_dl."""

import argparse
import json
import os
import os.path as osp
import sys
from multiprocessing.pool import ThreadPool

sys.path.insert(0, osp.dirname(osp.abspath(__file__)) + "/..")
from _download import youtube_download  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/gym")
    p.add_argument("-n", "--num-jobs", type=int, default=24)
    args = p.parse_args()
    anno_file = f"{args.data_root}/annotations/annotation.json"
    video_root = f"{args.data_root}/videos"
    os.makedirs(video_root, exist_ok=True)
    with open(anno_file) as f:
        annotation = json.load(f)
    ids = sorted(annotation)

    def one(vid):
        return (vid, *youtube_download(
            vid, osp.join(video_root, vid + ".mp4")))
    with ThreadPool(args.num_jobs) as pool:
        report = list(pool.map(one, ids))
    with open("download_report.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
