#!/usr/bin/env python
"""Parallel AVA video download from the s3 bucket (reference
``tools/data/ava/download_videos_parallel.py``)."""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)) + "/..")
from _download import fetch_urls  # noqa: E402

URL_PREFIX = "https://s3.amazonaws.com/ava-dataset/trainval/"


def main(source_file, output_dir, num_jobs=24, num_attempts=5):
    names = open(source_file).read().strip().split("\n")
    urls = [URL_PREFIX + n for n in names]
    status_list = fetch_urls(urls, output_dir, num_jobs, num_attempts)
    with open("download_report.json", "w") as f:
        json.dump(status_list, f)


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Helper script for downloading AVA videos")
    p.add_argument("source_file", help="TXT file with the video filenames")
    p.add_argument("output_dir", help="where videos will be saved")
    p.add_argument("-n", "--num-jobs", type=int, default=24)
    p.add_argument("--num-attempts", type=int, default=5)
    a = p.parse_args()
    main(a.source_file, a.output_dir, a.num_jobs, a.num_attempts)
