#!/usr/bin/env python
"""Parse the HVU category csv into the ``hvu_tags.json`` category->tags map
(reference ``tools/data/hvu/parse_tag_list.py``)."""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tag-list",
                   default="data/hvu/annotations/hvu_categories.csv")
    p.add_argument("--output", default="hvu_tags.json")
    args = p.parse_args()
    lines = [x.strip().split(",") for x in open(args.tag_list).readlines()[1:]]
    tag_categories = {}
    for tag, category in lines:
        tag_categories.setdefault(category, []).append(tag)
    for k in tag_categories:
        tag_categories[k].sort()
    with open(args.output, "w") as f:
        json.dump(tag_categories, f)


if __name__ == "__main__":
    main()
