#!/usr/bin/env python
"""Filter the HVU all-category file list down to one tag category
(reference ``tools/data/hvu/generate_sub_file_list.py``; that script dumps
the unfiltered list by mistake — this one writes the filtered entries)."""

import argparse
import json
import os.path as osp


def main(annotation_file, category):
    assert category in ["action", "attribute", "concept", "event", "object",
                        "scene"]
    with open(annotation_file) as f:
        data = json.load(f)
    basename = osp.basename(annotation_file).replace("hvu", f"hvu_{category}")
    target_file = osp.join(osp.dirname(annotation_file), basename)
    result = []
    for item in data:
        label = item["label"]
        if category in label:
            result.append({**item, "label": label[category]})
    with open(target_file, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="generate HVU per-category file list")
    p.add_argument("annotation_file")
    p.add_argument("category", choices=["action", "attribute", "concept",
                                        "event", "object", "scene"])
    a = p.parse_args()
    main(a.annotation_file, a.category)
