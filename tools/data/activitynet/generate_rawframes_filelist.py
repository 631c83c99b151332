#!/usr/bin/env python
"""Generate ActivityNet untrimmed-video and trimmed-clip rawframe lists
(reference ``tools/data/activitynet/generate_rawframes_filelist.py``)."""

import argparse
import json
import os
import os.path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/ActivityNet")
    p.add_argument("--action-name-list", default="action_name.csv")
    args = p.parse_args()
    data_file = args.data_root
    rawframe_dir = f"{data_file}/rawframes"
    json_file = f"{data_file}/activity_net.v1-3.min.json"

    with open(json_file) as f:
        database = json.load(f)["database"]
    anet_labels = [x.strip()
                   for x in open(args.action_name_list).readlines()[1:]]
    dir_list = [osp.join(rawframe_dir, x) for x in os.listdir(rawframe_dir)]

    def count_frames(video):
        for dir_name in dir_list:
            if video in dir_name:
                return osp.basename(dir_name), len(os.listdir(dir_name))
        return None, None

    training, validation, key_dict = {}, {}, {}
    for k, data in database.items():
        subset = data["subset"]
        if subset not in ("training", "validation"):
            continue
        label = anet_labels.index(data["annotations"][0]["label"])
        gt_dir_name, num_frames = count_frames(k)
        if gt_dir_name is None:
            continue
        target = training if subset == "training" else validation
        target[gt_dir_name] = [num_frames, label]
        key_dict[gt_dir_name] = k

    for name, table in (("train", training), ("val", validation)):
        lines = [f"{k} {v[0]} {v[1]}" for k, v in table.items()]
        with open(osp.join(data_file, f"anet_{name}_video.txt"), "w") as f:
            f.write("\n".join(lines))

    def clip_list(k, anno, video_anno):
        num_frames = video_anno[0]
        fps = num_frames / anno["duration"]
        lines = []
        for seg in anno["annotations"]:
            label = anet_labels.index(seg["label"])
            start = int(seg["segment"][0] * fps)
            end = min(int(seg["segment"][1] * fps), num_frames - 1)
            lines.append(f"{k} {start} {end - start + 1} {label}")
        return lines

    for name, table in (("train", training), ("val", validation)):
        clips = []
        for k in table:
            clips.extend(clip_list(k, database[key_dict[k]], table[k]))
        with open(osp.join(data_file, f"anet_{name}_clip.txt"), "w") as f:
            f.write("\n".join(clips))


if __name__ == "__main__":
    main()
