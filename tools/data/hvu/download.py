#!/usr/bin/env python
"""Download + trim HVU clips from the official csv (reference
``tools/data/hvu/download.py``). Requires yt_dlp/youtube_dl; trimming uses
the in-repo readers + cv2 instead of the ffmpeg CLI."""

import argparse
import csv
import json
import os
import os.path as osp
import sys
import tempfile
from multiprocessing.pool import ThreadPool

sys.path.insert(0, osp.dirname(osp.abspath(__file__)) + "/..")
from _download import youtube_download  # noqa: E402
from _trim import trim_video  # noqa: E402


def parse_hvu_annotations(input_csv):
    """rows: Tags, youtube_id, time_start, time_end."""
    rows = []
    with open(input_csv) as f:
        for r in csv.DictReader(f):
            rows.append(dict(video_id=r["youtube_id"],
                             start=float(r["time_start"]),
                             end=float(r["time_end"])))
    return rows


def download_clip_wrapper(row, output_dir, tmp_dir):
    start, end = int(row["start"] * 10), int(row["end"] * 10)
    name = f"{row['video_id']}_{start:06d}_{end:06d}.mp4"
    output = osp.join(output_dir, name)
    if osp.exists(output):
        return name, True, "Exists"
    # clip-keyed temp: segments of one video must not race on one file
    tmp = osp.join(tmp_dir, name + ".dl.mp4")
    ok, msg = youtube_download(row["video_id"], tmp)
    if not ok:
        return name, False, msg
    ok = trim_video(tmp, output, row["start"], row["end"] - row["start"])
    os.remove(tmp)
    return name, ok, "Downloaded" if ok else "Trim failed"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input_csv")
    p.add_argument("output_dir")
    p.add_argument("-n", "--num-jobs", type=int, default=24)
    p.add_argument("-t", "--tmp-dir", default=tempfile.gettempdir())
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    rows = parse_hvu_annotations(args.input_csv)
    with ThreadPool(args.num_jobs) as pool:
        report = list(pool.map(
            lambda r: download_clip_wrapper(r, args.output_dir, args.tmp_dir),
            rows))
    with open("download_report.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
