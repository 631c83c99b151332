#!/usr/bin/env python
"""Download + trim Kinetics clips from the official csv annotations
(reference ``tools/data/kinetics/download.py``, itself the ActivityNet
crawler). YouTube fetch needs yt_dlp/youtube_dl; trimming uses the in-repo
readers + cv2 instead of the ffmpeg CLI."""

import argparse
import csv
import os
import os.path as osp
import sys
import tempfile
from multiprocessing.pool import ThreadPool

sys.path.insert(0, osp.dirname(osp.abspath(__file__)) + "/..")
from _download import youtube_download  # noqa: E402
from _trim import trim_video  # noqa: E402


def parse_kinetics_annotations(input_csv):
    """rows: {video-id, start-time, end-time, label-name}"""
    rows = []
    with open(input_csv) as f:
        for r in csv.DictReader(f):
            rows.append(dict(
                video_id=r["youtube_id"],
                start=float(r["time_start"]),
                end=float(r["time_end"]),
                label=r.get("label", "test")))
    return rows


def download_clip_wrapper(row, label_to_dir, trim_format, tmp_dir):
    label_dir = label_to_dir[row["label"]]
    name = (f"{row['video_id']}_{trim_format % row['start']}_"
            f"{trim_format % row['end']}.mp4")
    output = osp.join(label_dir, name)
    if osp.exists(output):
        return name, True, "Exists"
    # temp is keyed by the CLIP name, not the video id: two segments of the
    # same video must not race on one temp file under the thread pool
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
    p.add_argument("-f", "--trim-format", default="%06d")
    p.add_argument("-n", "--num-jobs", type=int, default=24)
    p.add_argument("-t", "--tmp-dir", default=tempfile.gettempdir())
    args = p.parse_args()
    # int-style name stamps like the reference crawler
    trim_format = args.trim_format.replace("%06d", "%06.0f")

    rows = parse_kinetics_annotations(args.input_csv)
    label_to_dir = {}
    for row in rows:
        d = osp.join(args.output_dir, row["label"].replace(" ", "_"))
        os.makedirs(d, exist_ok=True)
        label_to_dir[row["label"]] = d
    with ThreadPool(args.num_jobs) as pool:
        report = list(pool.map(
            lambda r: download_clip_wrapper(r, label_to_dir, trim_format,
                                            args.tmp_dir), rows))
    import json
    with open("download_report.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
