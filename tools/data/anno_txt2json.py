#!/usr/bin/env python
"""Convert a txt annotation list to json (reference
``tools/data/anno_txt2json.py``): single- or multi-label, rawframes or
videos format.

    python tools/data/anno_txt2json.py <list.txt> [--format rawframes|videos]
"""

import argparse
import json


def lines2dictlist(lines, fmt):
    """``frame_dir total_frames label...`` / ``filename label...`` lines ->
    json dicts (reference ``anno_txt2json.py:29-96``)."""
    rows = [x.split() for x in lines if x.strip()]
    if fmt == "rawframes":
        return [dict(frame_dir=r[0], total_frames=int(r[1]),
                     label=[int(x) for x in r[2:]]) for r in rows]
    return [dict(filename=r[0], label=[int(x) for x in r[1:]])
            for r in rows]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("annofile")
    p.add_argument("--format", default="rawframes",
                   choices=["rawframes", "videos"])
    p.add_argument("--output", default=None)
    args = p.parse_args()
    with open(args.annofile) as f:
        lines = [x.strip() for x in f]
    result = lines2dictlist(lines, args.format)
    out = args.output or args.annofile.replace(".txt", ".json")
    with open(out, "w") as f:
        json.dump(result, f)
    print(f"wrote {out} ({len(result)} items)")


if __name__ == "__main__":
    main()
