"""Offline test of tools/verify_zoo.py (VERDICT r4 item 8).

Exercises the script end-to-end with a synthetic mmcv-format released
checkpoint (built from the ACTUAL reference torch module), a synthetic
rawframe dataset, and a tiny manifest: the zoo verification flow —
manifest -> config -> converter -> multi-view eval -> expectation diff —
runs today without egress; the real checkpoints slot in via the manifest
URLs the moment download is possible.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
SCRIPT = os.path.join(REPO, "tools", "verify_zoo.py")

RES, PATCH, D, HEADS, LAYERS, T, CLASSES = 32, 16, 64, 4, 2, 4, 2

CONFIG_TPL = """
model = dict(
    type="Recognizer3D",
    backbone=dict(type="AIM", input_resolution={res}, patch_size={patch},
                  width={d}, layers={layers}, heads={heads}, num_frames={t},
                  drop_path_rate=0.0),
    cls_head=dict(type="I3DHead", num_classes={classes}, in_channels={d},
                  dropout_ratio=0.0),
    test_cfg=dict(average_clips="prob"))
_eval_ds = dict(type="RawframeDataset", ann_file="{ann}",
                data_prefix="{prefix}", filename_tmpl="image_{{:05d}}.jpg",
                pipeline=[
                    dict(type="SampleFrames", clip_len={t}, frame_interval=1,
                         num_clips=1, test_mode=True),
                    dict(type="RawFrameDecode"),
                    dict(type="Resize", scale=({res}, {res}),
                         keep_ratio=False),
                    dict(type="Normalize",
                         mean=[122.769, 116.74, 104.04],
                         std=[68.493, 66.63, 70.321]),
                    dict(type="FormatShape", input_format="NCTHW"),
                ])
data = dict(
    videos_per_gpu=2,
    workers_per_gpu=1,
    val=_eval_ds,
    test=_eval_ds)
"""


@pytest.fixture(scope="module")
def zoo_env(tmp_path_factory):
    import cv2

    from tests.golden.reference_loader import load_reference_backbone_module

    root = tmp_path_factory.mktemp("zoo")
    # --- synthetic rawframe dataset: 4 clips, 2 classes -------------------
    prefix = root / "frames"
    lines = []
    rng = np.random.default_rng(3)
    for v in range(4):
        d = prefix / f"v{v}"
        d.mkdir(parents=True)
        for i in range(1, T + 1):
            img = rng.integers(0, 255, (RES, RES, 3), np.uint8)
            cv2.imwrite(str(d / f"image_{i:05d}.jpg"), img)
        lines.append(f"v{v} {T} {v % CLASSES}")
    ann = root / "val.txt"
    ann.write_text("\n".join(lines) + "\n")

    # --- tiny recipe ------------------------------------------------------
    cfg_path = root / "tiny_zoo.py"
    cfg_path.write_text(CONFIG_TPL.format(
        res=RES, patch=PATCH, d=D, layers=LAYERS, heads=HEADS, t=T,
        classes=CLASSES, ann=ann, prefix=prefix))

    # --- synthetic released checkpoint from the reference module ----------
    mod = load_reference_backbone_module("vitclip_aim.py")
    ref = mod.AIM(input_resolution=RES, num_frames=T, patch_size=PATCH,
                  width=D, layers=LAYERS, heads=HEADS, drop_path_rate=0.0,
                  pretrained=None)
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.02, generator=g))
    fc = torch.nn.Linear(D, CLASSES)
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    sd["cls_head.fc_cls.weight"] = fc.weight.data
    sd["cls_head.fc_cls.bias"] = fc.bias.data
    pth = root / "released.pth"
    torch.save({"meta": {"epoch": 30}, "state_dict": sd, "optimizer": {}},
               str(pth))

    # --- manifest ---------------------------------------------------------
    manifest = root / "zoo.yml"
    total_m = sum(p.numel() for p in ref.parameters()) / 1e6
    manifest.write_text(f"""
tiny:
  - name: tiny_aim
    config: {os.path.relpath(cfg_path, REPO)}
    backbone: ViT-tiny
    frames_views: {T}x1x1
    params_m: {total_m:.3f}
    tunable_params_m: 0.05
    expect: {{top1: 50.0}}
    url: null
""")
    return {"manifest": manifest, "pth": pth, "root": root}


@pytest.mark.slow
def test_verify_zoo_cli_end_to_end(zoo_env):
    out = zoo_env["root"] / "verdicts.json"
    env = dict(os.environ, AIM_DEVICE="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, SCRIPT, "--manifest", str(zoo_env["manifest"]),
         "--local-pth", str(zoo_env["pth"]), "--split", "val",
         "--tol", "101", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    verdicts = json.loads(out.read_text())
    assert len(verdicts) == 1
    v = verdicts[0]
    assert v["params_ok"], v
    assert v["accuracy_ok"], v
    assert 0.0 <= v["top1"] <= 100.0


def test_verify_zoo_param_check_flags_wrong_counts(zoo_env, monkeypatch):
    """A manifest row with wrong published params must fail the check."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    monkeypatch.setenv("AIM_DEVICE", "cpu")
    import importlib

    vz = importlib.import_module("verify_zoo")
    rows = vz.load_manifest(str(zoo_env["manifest"]))
    row = dict(rows[0], params_m=500.0)  # absurd published count

    class A:
        cfg_options = []
        param_check_only = True
        local_pth = None

    v = vz.verify_row(row, A())
    assert not v["params_ok"]
