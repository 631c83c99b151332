#!/usr/bin/env python
"""Convert the fork's 3-column K400 lists (``path x label``) into the
2-column ``path label`` video lists the recipes consume (the fork's
``tools/data/generate_k400_list.py``, paths made arguments)."""

import argparse


def convert(in_file, out_file):
    with open(in_file) as f, open(out_file, "w") as out:
        for line in f:
            path, _, label = line.split(" ")
            out.write(f"{path} {label.rstrip()}\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-txt", required=True, help="k400_train.txt")
    p.add_argument("--val-txt", required=True, help="k400_val.txt")
    p.add_argument("--train-out", default="train_video_list.txt")
    p.add_argument("--val-out", default="val_video_list.txt")
    args = p.parse_args()
    convert(args.train_txt, args.train_out)
    convert(args.val_txt, args.val_out)


if __name__ == "__main__":
    main()
