#!/usr/bin/env python
"""Decompose an OmniSource raw video into 10-second clips
(reference ``tools/data/omnisource/trim_raw_video.py``; in-repo trim
instead of the ffmpeg CLI). The raw video is removed afterwards."""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)) + "/..")
from _trim import trim_video, video_duration  # noqa: E402


def trim(vid_name: str):
    try:
        lt = video_duration(vid_name)
    except Exception:  # noqa: BLE001 — mirror the reference's tolerance
        print(f"get_duration failed for video {vid_name}", flush=True)
        return
    name, _ = osp.splitext(vid_name)
    os.makedirs(name, exist_ok=True)
    i = 0
    while i * 10 < lt:
        trim_video(vid_name, osp.join(name, f"part_{i}.mp4"), i * 10, 10)
        i += 1
    os.remove(vid_name)


if __name__ == "__main__":
    trim(sys.argv[1])
