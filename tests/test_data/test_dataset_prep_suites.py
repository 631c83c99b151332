"""Per-dataset prep suites (reference tools/data/{gym,hvu,kinetics,
activitynet,omnisource}/*): annotation parsing, file-list generation,
in-repo video trimming, proposal conversion, detection-mAP reporting."""

import importlib.util
import json
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, REPO)


def load_tool(*rel):
    path = osp.join(REPO, "tools", "data", *rel[:-1], f"{rel[-1]}.py")
    spec = importlib.util.spec_from_file_location("_".join(rel), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def write_video(path, n=40, wh=(64, 48), fps=10):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, wh)
    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (wh[1], wh[0], 3)).astype(np.uint8), (11, 11), 4)
    for t in range(n):
        w.write(np.roll(base, t * 3, axis=1))
    w.release()


# ---------------------------------------------------------------------------
# shared trim helper


def test_trim_video_and_duration(tmp_path):
    trim = load_tool("_trim")
    src = tmp_path / "src.mp4"
    write_video(src, n=40, fps=10)  # 4 seconds
    assert abs(trim.video_duration(str(src)) - 4.0) < 0.5
    dst = tmp_path / "cut.mp4"
    assert trim.trim_video(str(src), str(dst), 1.0, 2.0)
    cap = cv2.VideoCapture(str(dst))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert 15 <= n <= 25  # ~2 s at 10 fps


def test_omnisource_trim_raw_video(tmp_path):
    tool = load_tool("omnisource", "trim_raw_video")
    src = tmp_path / "raw.mp4"
    write_video(src, n=250, fps=10)  # 25 seconds -> 3 parts
    tool.trim(str(src))
    parts = sorted(os.listdir(tmp_path / "raw"))
    assert parts == ["part_0.mp4", "part_1.mp4", "part_2.mp4"]
    assert not src.exists()  # raw removed, reference semantics


# ---------------------------------------------------------------------------
# gym


def test_gym_trim_and_file_list(tmp_path, monkeypatch, capsys):
    root = tmp_path / "gym"
    (root / "videos").mkdir(parents=True)
    (root / "annotations").mkdir()
    write_video(root / "videos" / "vidA.mp4", n=60, fps=10)
    anno = {"vidA": {"E_001": {"timestamps": [[1.0, 4.0]],
                               "segments": {"A_01": {"timestamps": [[0.5, 1.5]],
                                                     "stages": 1}}}},
            "missing": {"E_002": {"timestamps": [[0, 1]], "segments": None}}}
    with open(root / "annotations" / "annotation.json", "w") as f:
        json.dump(anno, f)

    trim_event = load_tool("gym", "trim_event")
    monkeypatch.setattr(sys, "argv", ["x", "--data-root", str(root)])
    trim_event.main()
    assert (root / "events" / "vidA_E_001.mp4").exists()
    event_anno = json.load(open(root / "annotations/event_annotation.json"))
    assert "vidA_E_001" in event_anno

    trim_sub = load_tool("gym", "trim_subaction")
    monkeypatch.setattr(sys, "argv", ["x", "--data-root", str(root)])
    trim_sub.main()
    assert (root / "subactions" / "vidA_E_001_A_01.mp4").exists()

    # file list over the produced subactions
    for split in ("train", "val"):
        with open(root / "annotations" / f"gym99_{split}_org.txt", "w") as f:
            f.write("vidA_E_001_A_01 3\nnot_there 5\n")
    gen = load_tool("gym", "generate_file_list")
    monkeypatch.setattr(sys, "argv", ["x", "--data-root", str(root)])
    gen.main()
    lines = open(root / "annotations/gym99_train.txt").read().splitlines()
    assert lines == ["vidA_E_001_A_01.mp4 3"]


# ---------------------------------------------------------------------------
# hvu


def test_hvu_tag_tools(tmp_path, monkeypatch):
    csvf = tmp_path / "hvu_categories.csv"
    csvf.write_text("Tags,category\nrunning,action\ndog,object\n"
                    "park,scene\njumping,action\n")
    out_tags = tmp_path / "hvu_tags.json"
    parse = load_tool("hvu", "parse_tag_list")
    monkeypatch.setattr(sys, "argv", ["x", "--tag-list", str(csvf),
                                      "--output", str(out_tags)])
    parse.main()
    tags = json.load(open(out_tags))
    assert tags == {"action": ["jumping", "running"], "object": ["dog"],
                    "scene": ["park"]}

    # generate_file_list over a fake downloaded dir
    vids = tmp_path / "videos"
    vids.mkdir()
    (vids / "abc_000010_000050.mp4").touch()
    in_csv = tmp_path / "hvu_train.csv"
    in_csv.write_text("Tags,youtube_id,time_start,time_end\n"
                      "running|dog,abc,1.0,5.0\n"
                      "park,zzz,2.0,6.0\n")  # zzz not downloaded
    out_json = tmp_path / "hvu_train.json"
    gen = load_tool("hvu", "generate_file_list")
    monkeypatch.setattr(sys, "argv", [
        "x", "--input_csv", str(in_csv), "--src_dir", str(vids),
        "--output", str(out_json), "--mode", "videos",
        "--tag-file", str(out_tags)])
    gen.main()
    result = json.load(open(out_json))
    assert result == [dict(filename="abc_000010_000050.mp4",
                           label=dict(action=[1], object=[0]))]

    sub = load_tool("hvu", "generate_sub_file_list")
    sub.main(str(out_json), "action")
    sub_result = json.load(open(tmp_path / "hvu_action_train.json"))
    assert sub_result == [dict(filename="abc_000010_000050.mp4", label=[1])]


# ---------------------------------------------------------------------------
# kinetics lists


def test_kinetics_generate_anno_and_k400_list(tmp_path, monkeypatch):
    for split in ("train", "val"):
        for cls in ("abseiling", "zumba"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            (d / f"{split}_{cls}.mp4").touch()
    gen = load_tool("kinetics", "generate_anno")
    monkeypatch.setattr(sys, "argv", [
        "x", "--train-path", str(tmp_path / "train"),
        "--val-path", str(tmp_path / "val"),
        "--train-out", str(tmp_path / "train_list.txt"),
        "--val-out", str(tmp_path / "val_list.txt")])
    gen.main()
    lines = open(tmp_path / "train_list.txt").read().splitlines()
    assert lines == ["abseiling/train_abseiling.mp4 0",
                     "zumba/train_zumba.mp4 1"]

    k400 = tmp_path / "k400_train.txt"
    k400.write_text("vid1.mp4 x 7\nvid2.mp4 x 3\n")
    conv = load_tool("generate_k400_list")
    monkeypatch.setattr(sys, "argv", [
        "x", "--train-txt", str(k400), "--val-txt", str(k400),
        "--train-out", str(tmp_path / "t.txt"),
        "--val-out", str(tmp_path / "v.txt")])
    conv.main()
    assert open(tmp_path / "t.txt").read().splitlines() == [
        "vid1.mp4 7", "vid2.mp4 3"]


# ---------------------------------------------------------------------------
# activitynet


@pytest.fixture()
def anet_root(tmp_path):
    root = tmp_path / "ActivityNet"
    root.mkdir()
    anno = {
        "v_abc": dict(duration_second=10.0, duration_frame=100, fps=10.0,
                      annotations=[dict(segment=[1.0, 4.0], label="Surfing")],
                      feature_frame=100),
        "v_def": dict(duration_second=8.0, duration_frame=80, fps=10.0,
                      annotations=[dict(segment=[2.0, 6.0], label="Diving")],
                      feature_frame=80),
    }
    with open(root / "anet_anno_action.json", "w") as f:
        json.dump(anno, f)
    with open(root / "video_info_new.csv", "w") as f:
        f.write("video,numFrame,seconds,fps,rfps,subset,featureFrame\n")
        f.write("v_abc,100,10.0,10.0,10.0,training,100\n")
        f.write("v_def,80,8.0,10.0,10.0,validation,80\n")
    return root


def test_anet_process_annotations(anet_root, monkeypatch):
    tool = load_tool("activitynet", "process_annotations")
    monkeypatch.setattr(sys, "argv", ["x", "--data-root", str(anet_root)])
    tool.main()
    train = json.load(open(anet_root / "anet_anno_train.json"))
    val = json.load(open(anet_root / "anet_anno_val.json"))
    assert list(train) == ["v_abc"] and list(val) == ["v_def"]
    assert train["v_abc"]["fps"] == 10.0


def test_anet_rawframes_filelist(anet_root, monkeypatch, tmp_path):
    frames = anet_root / "rawframes"
    for vid, n in (("v_abc", 100), ("v_def", 80)):
        d = frames / vid
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"img_{i:05d}.jpg").touch()
    with open(anet_root / "activity_net.v1-3.min.json", "w") as f:
        json.dump(dict(database={
            "abc": dict(subset="training", duration=10.0,
                        annotations=[dict(segment=[1.0, 4.0],
                                          label="Surfing")]),
            "def": dict(subset="validation", duration=8.0,
                        annotations=[dict(segment=[2.0, 6.0],
                                          label="Diving")]),
        }), f)
    names = tmp_path / "action_name.csv"
    names.write_text("action\nDiving\nSurfing\n")
    tool = load_tool("activitynet", "generate_rawframes_filelist")
    monkeypatch.setattr(sys, "argv", ["x", "--data-root", str(anet_root),
                                      "--action-name-list", str(names)])
    tool.main()
    video_lines = open(anet_root / "anet_train_video.txt").read().splitlines()
    assert video_lines == ["v_abc 100 1"]
    clip_lines = open(anet_root / "anet_train_clip.txt").read().splitlines()
    assert clip_lines == ["v_abc 10 31 1"]  # 1s..4s at 10 fps


def test_anet_convert_proposal_format(anet_root, monkeypatch, tmp_path):
    idx = tmp_path / "idx.txt"
    idx.write_text("Diving\nSurfing\n")
    results = dict(results={
        "abc": [dict(segment=[1.0, 4.0], score=0.9),
                dict(segment=[7.0, 9.0], score=0.2)],
        "def": [dict(segment=[2.0, 6.0], score=0.8)],
    })
    prop = tmp_path / "results.json"
    with open(prop, "w") as f:
        json.dump(results, f)
    out = tmp_path / "formatted.txt"
    tool = load_tool("activitynet", "convert_proposal_format")
    monkeypatch.setattr(sys, "argv", [
        "x", "--ann-file", str(anet_root / "anet_anno_action.json"),
        "--activity-index-file", str(idx), "--proposal-file", str(prop),
        "--formatted-proposal-file", str(out)])
    tool.main()
    # the output must round-trip through the in-repo SSN loader with
    # CONSISTENT units: num_frames = field1 * field2, frame boundaries
    from adapt_image_models_tpu.core.ssn_utils import (
        load_localize_proposal_file,
    )
    infos = load_localize_proposal_file(str(out))
    assert [v[0] for v in infos] == ["abc", "def"]
    video_id, num_frames, gts, props = infos[0]
    assert num_frames == 100  # duration 10 s at 10 fps
    # gt: Surfing (1-based label 2) at frames 10..40
    assert [int(x) for x in gts[0]] == [2, 10, 40]
    assert len(props) == 2
    # perfect-overlap proposal: label 2, iou/overlap 1.0, frames 10..40
    lbl, iou, ov, s, e = props[0]
    assert int(lbl) == 2 and float(iou) == 1.0 and float(ov) == 1.0
    assert (int(s), int(e)) == (10, 40)
    # the disjoint 7-9s proposal matches nothing -> background sentinel 0
    assert [x for x in props[1][:3]] == ["0", "0", "0"]


def test_anet_feature_postprocessing(tmp_path, monkeypatch):
    rgb, flow, dest = tmp_path / "rgb", tmp_path / "flow", tmp_path / "mb"
    rgb.mkdir(), flow.mkdir()
    rng = np.random.default_rng(0)
    for d in (rgb, flow):
        with open(d / "vidA.pkl", "wb") as f:
            pickle.dump(rng.normal(size=(37, 200)).astype(np.float32), f)
    tool = load_tool("activitynet", "activitynet_feature_postprocessing")
    monkeypatch.setattr(sys, "argv", [
        "x", "--rgb", str(rgb), "--flow", str(flow), "--dest", str(dest),
        "--output-format", "csv", "--num-workers", "1"])
    tool.main()
    lines = open(dest / "vidA.csv").read().splitlines()
    assert len(lines) == 101 and len(lines[1].split(",")) == 400


# ---------------------------------------------------------------------------
# detection mAP report


def test_activitynet_detection_map(tmp_path):
    from adapt_image_models_tpu.core.eval_detection import (
        ActivityNetDetection,
    )
    gt = {
        "v_abc": dict(annotations=[dict(segment=[1.0, 4.0], label="Surf")]),
        "v_def": dict(annotations=[dict(segment=[2.0, 6.0], label="Dive")]),
    }
    pred = dict(results={
        "abc": [dict(segment=[1.0, 4.0], label="Surf", score=0.9)],
        "def": [dict(segment=[2.0, 6.0], label="Dive", score=0.8)],
    })
    gtf, pf = tmp_path / "gt.json", tmp_path / "pred.json"
    gtf.write_text(json.dumps(gt)), pf.write_text(json.dumps(pred))
    det = ActivityNetDetection(str(gtf), str(pf))
    mAP, avg = det.evaluate()
    np.testing.assert_allclose(mAP, 1.0)  # perfect detections at every tIoU
    assert avg == 1.0
    # shifted prediction dies at high tIoU but lives at 0.5
    pred["results"]["abc"][0]["segment"] = [1.0, 3.0]  # iou = 2/3
    pf.write_text(json.dumps(pred))
    det2 = ActivityNetDetection(str(gtf), str(pf))
    mAP2, avg2 = det2.evaluate()
    assert mAP2[0] == 1.0 and mAP2[-1] == 0.5 and avg2 < 1.0


def test_report_map_cli(tmp_path):
    gt = {"v_abc": dict(annotations=[dict(segment=[1.0, 4.0],
                                          label="Surf")])}
    pred = dict(results={"abc": [dict(segment=[1.0, 4.0], label="Surf",
                                      score=0.9)]})
    gtf, pf = tmp_path / "gt.json", tmp_path / "pred.json"
    gtf.write_text(json.dumps(gt)), pf.write_text(json.dumps(pred))
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "tools/analysis/report_map.py"),
         "--proposal", str(pf), "--gt", str(gtf), "--cls", "label_in_file"],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0, out.stderr
    assert "Average-mAP: 1.0" in out.stdout
