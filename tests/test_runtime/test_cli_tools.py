"""Smoke tests for the analysis/deployment/misc CLI tools (reference keeps
its tools untested; we drive each on synthetic inputs)."""

import importlib.util
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
PY = sys.executable
# AIM_FAST_COMPILE / AIM_COMPILE_CACHE (utils/env.apply_device_override):
# tool subprocesses are compile-dominated on tiny inputs and cannot see the
# conftest's in-process jax.config tuning — skip most XLA passes and share a
# persistent cache so warm suite re-runs skip tool compiles entirely
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
           AIM_FAST_COMPILE="1",
           AIM_COMPILE_CACHE=osp.join(REPO, "tests", ".jax_cache_tools"))


def run_tool(*args, ok=True):
    r = subprocess.run([PY, *args], capture_output=True, text=True,
                       cwd=REPO, env=ENV, timeout=300)
    if ok:
        assert r.returncode == 0, r.stderr[-800:]
    return r


def test_analyze_logs(tmp_path):
    log = tmp_path / "train.log"
    log.write_text("\n".join(
        f"Epoch [{e}][{i}/10] lr: 3.0e-04 loss: {1.0 / (e * 10 + i):.4f} "
        f"top1: 0.5000 top5: 0.9000 clips/s: {100 + i}.0"
        for e in (1, 2) for i in range(1, 11)))
    r = run_tool("tools/analysis/analyze_logs.py", "cal_train_time",
                 str(log))
    assert "epoch 1" in r.stdout and "clips/s" in r.stdout
    r = run_tool("tools/analysis/analyze_logs.py", "dump_json", str(log))
    rows = json.loads(r.stdout)
    assert len(rows) == 20 and rows[0]["epoch"] == 1


def test_print_config():
    r = run_tool("tools/analysis/print_config.py",
                 "configs/recognition/vit/vitclip_debug_tiny.py")
    assert "Recognizer3D" in r.stdout or "backbone" in r.stdout


def test_report_accuracy(tmp_path):
    rng = np.random.default_rng(0)
    labels = np.arange(8) % 3
    # model A perfect, model B random — fused must stay >= B
    a = np.zeros((8, 3), np.float32)
    a[np.arange(8), labels] = 1.0
    b = rng.normal(size=(8, 3)).astype(np.float32)
    np.savez(tmp_path / "a.npz", scores=a, labels=labels)
    np.savez(tmp_path / "b.npz", scores=b, labels=labels)
    r = run_tool("tools/analysis/report_accuracy.py", "--scores",
                 str(tmp_path / "a.npz"), str(tmp_path / "b.npz"),
                 "--weights", "10.0", "1.0")
    assert "top1 1.0000" in r.stdout  # heavy weight on the perfect model


def test_check_videos(tmp_path):
    cv2 = pytest.importorskip("cv2")
    ok_path = tmp_path / "ok.avi"
    w = cv2.VideoWriter(str(ok_path), cv2.VideoWriter_fourcc(*"MJPG"),
                        30, (32, 32))
    for _ in range(5):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    (tmp_path / "bad.avi").write_bytes(b"not a video")
    ann = tmp_path / "list.txt"
    ann.write_text("ok.avi 0\nbad.avi 1\n")
    bad_out = tmp_path / "bad.txt"
    run_tool("tools/misc/check_videos.py", str(ann), "--prefix",
             str(tmp_path), "--out", str(bad_out), "--workers", "1")
    bad = bad_out.read_text()
    assert "bad.avi" in bad and "ok.avi" not in bad


def test_check_videos_config_tool(tmp_path):
    """The config-driven integrity checker (reference
    tools/analysis/check_videos.py): probes first+last+3 random frames per
    video, appends failures to --output-file, exits 1 when any are bad,
    and --remove-corrupted-videos deletes them."""
    cv2 = pytest.importorskip("cv2")
    ok_path = tmp_path / "ok.avi"
    w = cv2.VideoWriter(str(ok_path), cv2.VideoWriter_fourcc(*"MJPG"),
                        30, (32, 32))
    for _ in range(5):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    (tmp_path / "bad.avi").write_bytes(b"not a video")
    # corrupt TAIL: opens fine and frame 0 decodes, but the last-frame probe
    # must fail (strict reader — the training path's last-good-frame
    # substitution would otherwise hide it)
    blob = ok_path.read_bytes()
    (tmp_path / "trunc.avi").write_bytes(blob[:int(len(blob) * 0.5)])
    ann = tmp_path / "list.txt"
    ann.write_text("ok.avi 0\nbad.avi 1\ntrunc.avi 0\n")
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "data = dict(train=dict(type='VideoDataset', "
        f"ann_file={str(ann)!r}, data_prefix={str(tmp_path)!r}, "
        "pipeline=[]))\n")
    out = tmp_path / "invalid.txt"
    r = run_tool("tools/analysis/check_videos.py", str(cfg),
                 "--output-file", str(out), "--num-processes", "1",
                 "--remove-corrupted-videos", ok=False)
    assert r.returncode == 1, r.stderr[-800:]
    assert "2 are corrupted/missing" in r.stdout
    bad = out.read_text()
    assert "bad.avi" in bad and "trunc.avi" in bad and "ok.avi" not in bad
    assert not (tmp_path / "bad.avi").exists()      # deleted
    assert not (tmp_path / "trunc.avi").exists()    # deleted
    assert ok_path.exists()                          # kept

    # all-clean run exits 0 and leaves no output file
    ann.write_text("ok.avi 0\n")
    r = run_tool("tools/analysis/check_videos.py", str(cfg),
                 "--output-file", str(out), "--num-processes", "1")
    assert "none are corrupted/missing" in r.stdout
    assert not out.exists() or out.read_text() == ""


def test_bsn_pgm_tool_split_picks_matching_cfg(tmp_path):
    """--config + --split train must read pgm_features_train_cfg and
    ann_file_train (the reference generates the PEM training set with
    top_k=500, not the test cfg's 1000)."""
    for split in ("train", "val"):
        (tmp_path / f"anno_{split}.json").write_text(json.dumps({
            f"v_{split}": dict(duration_second=10.0, duration_frame=300,
                               feature_frame=300,
                               annotations=[dict(segment=[2.0, 6.0])])}))
    tem_dir = tmp_path / "tem"
    tem_dir.mkdir()
    rng = np.random.default_rng(0)
    tem = np.concatenate([rng.uniform(0.1, 0.9, (20, 3)),
                          np.linspace(0, 1, 20)[:, None],
                          np.linspace(0, 1, 20)[:, None]], axis=1)
    for name in ("v_train", "v_val"):
        np.savetxt(tem_dir / f"{name}.csv", tem, delimiter=",",
                   header="action,start,end,tmin,tmax", comments="")
    cfgp = tmp_path / "pgm.py"
    cfgp.write_text(f"""
ann_file_train = {str(tmp_path / 'anno_train.json')!r}
ann_file_val = {str(tmp_path / 'anno_val.json')!r}
tem_results_dir = {str(tem_dir)!r}
pgm_proposals_dir = {str(tmp_path / 'props')!r}
pgm_features_dir = {str(tmp_path / 'feats')!r}
pgm_proposals_cfg = dict(temporal_scale=20, peak_threshold=0.5)
pgm_features_test_cfg = dict(top_k=1000, num_sample_start=8,
                             num_sample_end=8, num_sample_action=16,
                             num_sample_interp=3, bsp_boundary_ratio=0.2)
pgm_features_train_cfg = dict(top_k=500, num_sample_start=8,
                              num_sample_end=8, num_sample_action=4,
                              num_sample_interp=3, bsp_boundary_ratio=0.2)
""")
    run_tool("tools/misc/bsn_proposal_generation.py", "--config", str(cfgp),
             "--split", "train")
    run_tool("tools/misc/bsn_proposal_generation.py", "--config", str(cfgp))
    f_train = np.load(tmp_path / "feats" / "v_train.npy")
    f_val = np.load(tmp_path / "feats" / "v_val.npy")
    # dim = start + end + action samples: train cfg 8+8+4, test cfg 8+8+16
    assert f_train.shape[1] == 20, f_train.shape
    assert f_val.shape[1] == 32, f_val.shape


def test_clip_feature_extraction_both_layouts(tmp_path):
    """The feature-extraction tool must speak both FormatShape contracts of
    its own recipes (NCHW 2D segments, NCTHW 3D) and force --batch 1 for
    UntrimmedSampleFrames (per-video clip counts differ)."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "rawframes"
    lines = []
    rng = np.random.default_rng(0)
    for v, frames in enumerate((40, 56)):  # different clip counts
        d = root / f"vid{v}"
        d.mkdir(parents=True)
        for i in range(0, frames + 1):
            cv2.imwrite(str(d / f"img_{i:05d}.jpg"),
                        rng.integers(0, 255, (32, 32, 3), np.uint8))
        lines.append(f"vid{v} {frames} {v % 2}")
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(lines))

    recipes = [
        ("recognition/tsn/tsn_r50_clip_feature_extraction_1x1x3_rgb.py",
         1, "NCHW"),
        ("recognition/slowonly/"
         "slowonly_r50_clip_feature_extraction_4x16x1_rgb.py", 4, "NCTHW"),
    ]
    for base, clip_len, fmt in recipes:
        cfgp = tmp_path / ("cfg_" + fmt + ".py")
        cfgp.write_text(f"""
_base_ = ["{REPO}/configs/{base}"]
model = dict(backbone=dict(depth=18, base_channels=8),
             cls_head=dict(in_channels=64))
data = dict(test=dict(
    ann_file={str(ann)!r}, data_prefix={str(root)!r},
    pipeline=[
        dict(type="UntrimmedSampleFrames", clip_len={clip_len},
             frame_interval=16),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="{fmt}"),
    ]))
""")
        out = tmp_path / f"feats_{fmt}.npz"
        r = run_tool("tools/misc/clip_feature_extraction.py", str(cfgp),
                     str(out), "--batch", "4")
        assert "forcing --batch 1" in r.stderr
        data = np.load(out)
        assert data["features"].shape == (2, 64), data["features"].shape
        assert np.isfinite(data["features"]).all()
        assert list(data["labels"]) == [0, 1]


@pytest.mark.slow
def test_profile_tool_writes_trace(tmp_path):
    r = run_tool("tools/analysis/profile.py",
                 "configs/recognition/vit/vitclip_debug_tiny.py",
                 "--out", str(tmp_path / "trace"), "--batch", "1",
                 "--iters", "1")
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz or xplane
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found, "no trace files written"


def test_dataset_prep_shell_wrappers():
    """Every reference tools/data/<ds>/*.sh has a repo wrapper that parses
    (bash -n) and whose python invocations point at real in-repo tools
    (round-3 closure of the per-dataset prep-script surface)."""
    import glob
    import re
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    ref = "/root/reference/tools/data"
    if os.path.isdir(ref):
        ref_sh = {os.path.relpath(p, ref)
                  for p in glob.glob(os.path.join(ref, "*", "*.sh"))}
        mine = {os.path.relpath(p, os.path.join(repo, "tools", "data"))
                for p in glob.glob(os.path.join(repo, "tools", "data",
                                                "*", "*.sh"))}
        assert ref_sh <= mine, f"missing wrappers: {sorted(ref_sh - mine)}"
    for sh in glob.glob(os.path.join(repo, "tools", "data", "*", "*.sh")):
        subprocess.run(["bash", "-n", sh], check=True)
        text = open(sh).read()
        for m in re.finditer(r'python "\$REPO/([^"]+)"', text):
            assert os.path.exists(os.path.join(repo, m.group(1))), \
                f"{sh} calls missing tool {m.group(1)}"


def test_benchmark_e2e_tool():
    """--e2e drives decode->device->logits end-to-end (real mp4v sources,
    worker pool, jitted forward) and reports sustained clips/s — the TPU
    analog of the reference's dataloader-included iteration timing
    (tools/analysis/benchmark.py:29-60)."""
    r = run_tool("tools/analysis/benchmark.py",
                 "configs/recognition/vit/vitclip_debug_tiny.py",
                 "--e2e", "--batch", "4", "--iters", "3", "--workers", "2")
    assert "end-to-end decode->logits" in r.stdout, r.stdout
