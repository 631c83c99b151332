#!/usr/bin/env python
"""Official-split parsers shared by file-list builders (reference
``tools/data/parse_file_list.py:534``). Each ``parse_*_splits`` returns a
list of ``(train, val[, test])`` tuples whose items are ``(video_id,
label)`` — consumed by ``build_file_list.py --split-parser`` or importable
directly.

Dataset annotation roots follow the reference layout:
    data/ucf101/annotations/{classInd.txt, trainlist0N.txt, testlist0N.txt}
    data/hmdb51/annotations/*_test_split{1,2,3}.txt
    data/kinetics{400,600,700}/annotations/kinetics_{train,val,test}.csv
    data/sthv2/annotations/something-something-v2-{train,validation,labels}.json
    data/diving48/annotations/Diving48_V2_{train,test}.json
"""

import csv

import glob
import json
import os
import os.path as osp


def parse_directory(path, rgb_prefix="img_", flow_x_prefix="flow_x_",
                    flow_y_prefix="flow_y_", level=1):
    """Scan extracted-frame directories -> {video_id: (path, n_rgb,
    n_flow)} (reference ``parse_file_list.py:9``)."""
    if level == 1:
        frame_dirs = glob.glob(osp.join(path, "*"))
        def key(d):  # noqa: E306
            return osp.basename(d)
    elif level == 2:
        frame_dirs = glob.glob(osp.join(path, "*", "*"))
        def key(d):  # noqa: E306
            return osp.join(*d.split(os.sep)[-2:])
    else:
        raise ValueError(f"level must be 1 or 2, got {level}")

    def count_prefix(files, prefix):
        return sum(1 for f in files if f.startswith(prefix))

    frame_dict = {}
    for d in sorted(frame_dirs):
        if not osp.isdir(d):
            continue
        files = os.listdir(d)
        n_rgb = count_prefix(files, rgb_prefix)
        n_x = count_prefix(files, flow_x_prefix)
        n_y = count_prefix(files, flow_y_prefix)
        if n_x != n_y:
            raise ValueError(f"x/flow frame mismatch in {d}: {n_x} vs {n_y}")
        frame_dict[key(d)] = (d, n_rgb, n_x)
    return frame_dict


def parse_ucf101_splits(annotations="data/ucf101/annotations", level=2):
    """UCF101 trainlist/testlist 1-3 (reference ``parse_file_list.py:83``)."""
    with open(osp.join(annotations, "classInd.txt")) as f:
        class_index = {}
        for line in f:
            idx, name = line.strip().split()
            class_index[name] = int(idx) - 1

    def line2rec(line):
        items = line.strip().split()
        vid = osp.splitext(items[0])[0]
        if level == 1:
            vid = osp.basename(vid)
        label = class_index[vid.split("/")[0]] if "/" in vid else (
            int(items[1]) - 1 if len(items) > 1 else -1)
        if len(items) > 1:
            label = int(items[1]) - 1
        return vid, label

    splits = []
    for i in (1, 2, 3):
        with open(osp.join(annotations, f"trainlist{i:02d}.txt")) as f:
            train = [line2rec(l) for l in f if l.strip()]
        with open(osp.join(annotations, f"testlist{i:02d}.txt")) as f:
            test = []
            for l in f:
                if not l.strip():
                    continue
                vid = osp.splitext(l.strip().split()[0])[0]
                if level == 1:
                    vid = osp.basename(vid)
                test.append((vid, class_index[vid.split("/")[0]]))
        splits.append((train, test))
    return splits


def parse_hmdb51_split(annotations="data/hmdb51/annotations", level=2):
    """HMDB51 ``*_test_split{1,2,3}.txt`` with tags 1=train / 2=test
    (reference ``parse_file_list.py:420``)."""
    class_files = sorted(glob.glob(osp.join(annotations,
                                            "*_test_split1.txt")))
    classes = sorted(osp.basename(f)[:-len("_test_split1.txt")]
                     for f in class_files)
    class_index = {c: i for i, c in enumerate(classes)}

    splits = []
    for i in (1, 2, 3):
        train, test = [], []
        for cls in classes:
            with open(osp.join(annotations,
                               f"{cls}_test_split{i}.txt")) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) != 2:
                        continue
                    name, tag = osp.splitext(parts[0])[0], int(parts[1])
                    vid = f"{cls}/{name}" if level == 2 else name
                    if tag == 1:
                        train.append((vid, class_index[cls]))
                    elif tag == 2:
                        test.append((vid, class_index[cls]))
        splits.append((train, test))
    return splits


def parse_kinetics_splits(annotations, dataset="kinetics400", level=1):
    """Kinetics CSVs (label,youtube_id,start,end,split) (reference
    ``parse_file_list.py:307``). Returns one (train, val, test) tuple."""

    def normalize(name):
        return name.strip('"').replace(" ", "_").replace("'", "")

    with open(osp.join(annotations, f"{dataset}_train.csv")) as f:
        rows = list(csv.DictReader(f))
    classes = sorted({normalize(r["label"]) for r in rows})
    class_index = {c: i for i, c in enumerate(classes)}

    def convert(rows, test=False):
        out = []
        for r in rows:
            vid = (f"{r['youtube_id']}_{int(r['time_start']):06d}"
                   f"_{int(r['time_end']):06d}")
            if level == 2 and not test:
                vid = f"{normalize(r['label'])}/{vid}"
            out.append((vid, -1 if test else class_index[normalize(r["label"])]))
        return out

    train = convert(rows)
    with open(osp.join(annotations, f"{dataset}_val.csv")) as f:
        val = convert(list(csv.DictReader(f)))
    test_path = osp.join(annotations, f"{dataset}_test.csv")
    test = []
    if osp.exists(test_path):
        with open(test_path) as f:
            test = convert(list(csv.DictReader(f)), test=True)
    return [(train, val, test)]


def parse_sthv2_splits(annotations="data/sthv2/annotations", level=1):
    """Something-Something v2 JSON lists (reference
    ``parse_file_list.py:230``)."""
    with open(osp.join(annotations,
                       "something-something-v2-labels.json")) as f:
        class_index = {k: int(v) for k, v in json.load(f).items()}

    def convert(path):
        with open(path) as f:
            items = json.load(f)
        out = []
        for it in items:
            template = it["template"].replace("[", "").replace("]", "")
            out.append((it["id"], class_index[template]))
        return out

    train = convert(osp.join(
        annotations, "something-something-v2-train.json"))
    val = convert(osp.join(
        annotations, "something-something-v2-validation.json"))
    return [(train, val)]


def parse_diving48_splits(annotations="data/diving48/annotations"):
    """Diving48 V2 JSON lists (reference ``parse_file_list.py:509``)."""

    def convert(path):
        with open(path) as f:
            items = json.load(f)
        return [(it["vid_name"], int(it["label"])) for it in items]

    train = convert(osp.join(annotations, "Diving48_V2_train.json"))
    test = convert(osp.join(annotations, "Diving48_V2_test.json"))
    return [(train, test)]


def parse_mit_splits(annotations="data/mit/annotations"):
    """Moments-in-Time CSV lists (reference ``parse_file_list.py:390``)."""
    with open(osp.join(annotations, "moments_categories.txt")) as f:
        class_index = {}
        for line in f:
            cat, idx = line.strip().split(",")
            class_index[cat] = int(idx)

    def convert(path):
        out = []
        with open(path) as f:
            for line in f:
                vid = line.strip().split(",")[0]
                out.append((osp.splitext(vid)[0], class_index[vid.split("/")[0]]))
        return out

    train = convert(osp.join(annotations, "trainingSet.csv"))
    val = convert(osp.join(annotations, "validationSet.csv"))
    return [(train, val)]


PARSERS = {
    "ucf101": parse_ucf101_splits,
    "hmdb51": parse_hmdb51_split,
    "kinetics400": lambda a, **kw: parse_kinetics_splits(a, "kinetics400", **kw),
    "kinetics600": lambda a, **kw: parse_kinetics_splits(a, "kinetics600", **kw),
    "kinetics700": lambda a, **kw: parse_kinetics_splits(a, "kinetics700", **kw),
    "sthv2": parse_sthv2_splits,
    "diving48": lambda a, **kw: parse_diving48_splits(a),
    "mit": lambda a, **kw: parse_mit_splits(a),
}


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=sorted(PARSERS))
    p.add_argument("annotations", help="annotation directory")
    p.add_argument("out_dir")
    p.add_argument("--level", type=int, default=2, choices=[1, 2])
    p.add_argument("--format", default="videos",
                   choices=["videos", "rawframes"])
    p.add_argument("--frame-root", default=None,
                   help="rawframe root (for --format rawframes counts)")
    p.add_argument("--ext", default="mp4")
    args = p.parse_args()

    kw = {} if args.dataset in ("diving48", "mit") else dict(level=args.level)
    splits = PARSERS[args.dataset](args.annotations, **kw)
    frame_dict = (parse_directory(args.frame_root, level=args.level)
                  if args.format == "rawframes" and args.frame_root else None)

    os.makedirs(args.out_dir, exist_ok=True)
    names = ("train", "val", "test")
    for si, split in enumerate(splits, 1):
        for part, items in zip(names, split):
            suffix = (f"_split_{si}" if len(splits) > 1 else "")
            out = osp.join(
                args.out_dir,
                f"{args.dataset}_{part}{suffix}_{args.format}.txt")
            with open(out, "w") as f:
                for vid, label in items:
                    if frame_dict is not None:
                        if vid not in frame_dict:
                            continue
                        _, n_rgb, _ = frame_dict[vid]
                        f.write(f"{vid} {n_rgb} {label}\n")
                    else:
                        f.write(f"{vid}.{args.ext} {label}\n")
            print("wrote", out, f"({len(items)} items)")


if __name__ == "__main__":
    main()
