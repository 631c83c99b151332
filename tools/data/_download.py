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


def _main():
    """CLI used by the per-dataset download_*.sh wrappers: fetch one or
    more direct URLs into a directory (wget analog), optionally unzipping
    archives afterwards."""
    import argparse
    import zipfile
    import tarfile
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("urls", nargs="+")
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--jobs", type=int, default=4)
    parser.add_argument("--extract", action="store_true",
                        help="unpack downloaded .zip/.tar[.gz] archives "
                             "into --out-dir")
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    results = fetch_urls(args.urls, args.out_dir, num_jobs=args.jobs)
    failed = False
    for url, (ok, msg) in zip(args.urls, results):
        print(("ok   " if ok else "FAIL ") + f"{url}: {msg}")
        failed |= not ok
        name = osp.join(args.out_dir, osp.basename(url))
        if ok and args.extract and osp.exists(name):
            if name.endswith(".zip"):
                with zipfile.ZipFile(name) as z:
                    z.extractall(args.out_dir)
            elif name.endswith((".tar", ".tar.gz", ".tgz")):
                with tarfile.open(name) as t:
                    t.extractall(args.out_dir)
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    _main()
