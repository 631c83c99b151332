"""Data-prep tooling (reference tools/data/*): frame/flow extraction,
video resizing, split parsing, audio extraction + features."""

import importlib.util
import json
import os
import os.path as osp
import sys
import wave

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def load_tool(name):
    path = osp.join(REPO, "tools", "data", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"tool_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    """<root>/<class>/<video>.avi two-level layout, 20 frames each."""
    root = tmp_path_factory.mktemp("videos")
    for cls, n in (("run", 2), ("jump", 1)):
        (root / cls).mkdir()
        for i in range(n):
            path = str(root / cls / f"v{i}.avi")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                30, (64, 48))
            rng = np.random.default_rng(i)
            base = cv2.GaussianBlur(
                rng.integers(0, 255, (48, 64, 3)).astype(np.uint8),
                (11, 11), 4)
            for t in range(20):
                w.write(np.roll(base, t * 2, axis=1))
            w.release()
    return str(root)


def test_build_rawframes_rgb_and_flow(video_tree, tmp_path):
    tool = load_tool("build_rawframes")
    out = tmp_path / "frames"
    args = type("A", (), dict(task="both", new_short=0, new_width=0,
                              new_height=0, resume=False))()
    video = osp.join(video_tree, "run", "v0.avi")
    _, n = tool.extract_one((video, str(out / "run" / "v0"), args))
    assert n == 20
    files = os.listdir(out / "run" / "v0")
    assert sum(f.startswith("img_") for f in files) == 20
    assert sum(f.startswith("flow_x_") for f in files) == 19
    assert sum(f.startswith("flow_y_") for f in files) == 19
    # flow frames readable by the FlowFrameReader convention
    from adapt_image_models_tpu.data.video_reader import FlowFrameReader
    r = FlowFrameReader(str(out / "run" / "v0"), 19, start_index=1)
    flows = r.get_frames([1, 5, 5])
    assert flows.shape == (3, 48, 64, 2) and flows.dtype == np.uint8

    # resume skips
    _, n2 = tool.extract_one(
        (video, str(out / "run" / "v0"),
         type("A", (), dict(task="both", new_short=0, new_width=0,
                            new_height=0, resume=True))()))
    assert n2 == -1


def test_quantize_flow_bounds():
    tool = load_tool("build_rawframes")
    flow = np.array([[[-30.0, 0.0]], [[30.0, 20.0]]], np.float32)
    q = tool.quantize_flow(flow)
    assert q[0, 0, 0] == 0 and q[1, 0, 0] == 255
    assert q[0, 0, 1] == 128 and q[1, 0, 1] == 255


def test_resize_video(video_tree, tmp_path):
    tool = load_tool("resize_video")
    src = osp.join(video_tree, "run", "v0.avi")
    dst = str(tmp_path / "out" / "v0.avi")
    args = type("A", (), dict(dense=False, scale=24, resume=False,
                              fourcc="MJPG"))()
    _, ok = tool.resize_one((src, dst, args))
    assert ok
    cap = cv2.VideoCapture(dst)
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 24
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 20
    cap.release()


def test_parse_directory(video_tree, tmp_path):
    tool = load_tool("parse_file_list")
    root = tmp_path / "frames"
    for vid, n in (("a/x", 4), ("a/y", 2)):
        d = root / vid
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"img_{i + 1:05d}.jpg").write_bytes(b"")
            (d / f"flow_x_{i:05d}.jpg").write_bytes(b"")
            (d / f"flow_y_{i:05d}.jpg").write_bytes(b"")
    fd = tool.parse_directory(str(root), level=2)
    assert fd["a/x"][1:] == (4, 4) and fd["a/y"][1:] == (2, 2)


def test_parse_ucf101_and_hmdb51_splits(tmp_path):
    tool = load_tool("parse_file_list")
    ann = tmp_path / "ucf"
    ann.mkdir()
    (ann / "classInd.txt").write_text("1 Run\n2 Jump\n")
    for i in (1, 2, 3):
        (ann / f"trainlist{i:02d}.txt").write_text(
            "Run/v1.avi 1\nJump/v2.avi 2\n")
        (ann / f"testlist{i:02d}.txt").write_text("Run/v3.avi\n")
    splits = tool.parse_ucf101_splits(str(ann))
    assert len(splits) == 3
    train, test = splits[0]
    assert ("Run/v1", 0) in train and ("Jump/v2", 1) in train
    assert test == [("Run/v3", 0)]

    ann2 = tmp_path / "hmdb"
    ann2.mkdir()
    for cls in ("brush_hair", "walk"):
        for i in (1, 2, 3):
            (ann2 / f"{cls}_test_split{i}.txt").write_text(
                f"{cls}_v1.avi 1\n{cls}_v2.avi 2\n{cls}_v3.avi 0\n")
    hs = tool.parse_hmdb51_split(str(ann2))
    train, test = hs[0]
    assert ("brush_hair/brush_hair_v1", 0) in train
    assert ("walk/walk_v2", 1) in test
    assert all(v[1] in (0, 1) for v in train + test)


def test_parse_sthv2_and_diving48_and_kinetics(tmp_path):
    tool = load_tool("parse_file_list")
    ann = tmp_path / "sthv2"
    ann.mkdir()
    (ann / "something-something-v2-labels.json").write_text(
        json.dumps({"Doing a thing": "0", "Doing other": "1"}))
    (ann / "something-something-v2-train.json").write_text(json.dumps(
        [dict(id="101", template="Doing a [thing]"),
         dict(id="102", template="Doing other")]))
    (ann / "something-something-v2-validation.json").write_text(json.dumps(
        [dict(id="103", template="Doing other")]))
    (train, val), = tool.parse_sthv2_splits(str(ann))
    assert ("101", 0) in train and val == [("103", 1)]

    ann = tmp_path / "d48"
    ann.mkdir()
    (ann / "Diving48_V2_train.json").write_text(json.dumps(
        [dict(vid_name="a", label=3)]))
    (ann / "Diving48_V2_test.json").write_text(json.dumps(
        [dict(vid_name="b", label=7)]))
    (train, test), = tool.parse_diving48_splits(str(ann))
    assert train == [("a", 3)] and test == [("b", 7)]

    ann = tmp_path / "k400"
    ann.mkdir()
    hdr = "label,youtube_id,time_start,time_end,split\n"
    (ann / "kinetics400_train.csv").write_text(
        hdr + 'abseiling,xyz,0,10,train\n"air drumming",pqr,5,15,train\n')
    (ann / "kinetics400_val.csv").write_text(
        hdr + "abseiling,stu,1,11,val\n")
    (train, val, test), = tool.parse_kinetics_splits(str(ann), "kinetics400")
    assert ("xyz_000000_000010", 0) in train
    assert ("pqr_000005_000015", 1) in train
    assert val == [("stu_000001_000011", 0)] and test == []


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("wav")
    path = str(d / "tone.wav")
    sr = 44100
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.stack([y, y], 1).tobytes())
    return path


def test_extract_audio_native(wav_file, tmp_path):
    from adapt_image_models_tpu.data.cpp_decoder import is_available
    if not is_available():
        pytest.skip("libaimdecode.so not built")
    from adapt_image_models_tpu.data.cpp_decoder import extract_audio
    from adapt_image_models_tpu.data.audio import load_wav
    out = str(tmp_path / "out.wav")
    extract_audio(wav_file, out, sample_rate=16000, mono=True)
    y, sr = load_wav(out)
    assert sr == 16000 and abs(len(y) - 16000) < 200
    freq = np.fft.rfftfreq(len(y), 1 / sr)[
        np.argmax(np.abs(np.fft.rfft(y)))]
    assert abs(freq - 440) < 5


def test_build_audio_features(wav_file, tmp_path):
    tool = load_tool("build_audio_features")
    dst = str(tmp_path / "feat.npy")
    args = type("A", (), dict(sample_rate=16000, fft_size=1280,
                              hop_size=320, num_mels=80))()
    _, ok = tool.build_one((wav_file, dst, args))
    assert ok
    spec = np.load(dst)
    assert spec.ndim == 2 and spec.shape[1] == 80
    assert np.isfinite(spec).all()
