"""Shared download helpers for the dataset-prep tools.

Direct HTTP(S) files fetch with urllib (the reference shells out to wget);
YouTube sources require the ``yt_dlp``/``youtube_dl`` package, which is not
part of this image — those tools fail with an actionable message instead
of silently producing nothing.
"""

import os
import os.path as osp
import urllib.request
from multiprocessing.pool import ThreadPool


def fetch_url(url: str, output_file: str, num_attempts: int = 5):
    """wget -c analog; returns (ok, message)."""
    if osp.exists(output_file):
        return True, "Exists"
    for _ in range(num_attempts):
        try:
            urllib.request.urlretrieve(url, output_file + ".part")
            os.replace(output_file + ".part", output_file)
            return True, "Downloaded"
        except Exception as e:  # noqa: BLE001 — retry any transport error
            err = str(e)
    return False, f"Downloading Failed: {err}"


def fetch_urls(urls, output_dir: str, num_jobs: int = 8,
               num_attempts: int = 5):
    os.makedirs(output_dir, exist_ok=True)
    def one(url):
        return fetch_url(url, osp.join(output_dir, osp.basename(url)),
                         num_attempts)
    with ThreadPool(num_jobs) as pool:
        return list(pool.map(one, urls))


def youtube_download(video_id: str, output_file: str,
                     num_attempts: int = 5,
                     url_base: str = "https://www.youtube.com/watch?v="):
    """Download one YouTube video (reference crawler semantics). Requires
    yt_dlp or youtube_dl."""
    assert len(video_id) == 11, "video_identifier must have length 11"
    if osp.exists(output_file):
        return True, "Exists"
    try:
        import yt_dlp as ytdl
    except ImportError:
        try:
            import youtube_dl as ytdl
        except ImportError:
            raise ImportError(
                "YouTube downloads need yt_dlp or youtube_dl, which are not "
                "installed in this image; install one (or download the "
                "videos elsewhere and point the prep tools at them).")
    opts = {"quiet": True, "no_warnings": True, "format": "mp4",
            "outtmpl": output_file}
    for _ in range(num_attempts):
        try:
            with ytdl.YoutubeDL(opts) as y:
                y.download([url_base + video_id])
            break
        except Exception as e:  # noqa: BLE001
            err = str(e)
    ok = osp.exists(output_file)
    return ok, "Downloaded" if ok else f"Fail: {err}"
