"""Verify drive: the two new custom_backbones recipes end-to-end.

Loads the REAL config files (full-depth DenseNet-161 / ResNeXt-101 32x4d),
swaps the kinetics data for synthetic:// videos, and runs one epoch of
train_model + run_evaluation through the public API. CPU (relay down).
"""
import sys, time

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from adapt_image_models_tpu.config import Config
from adapt_image_models_tpu.apis.train import train_model
from adapt_image_models_tpu.apis.test import run_evaluation

ANN = "/tmp/vd_ann.txt"
with open(ANN, "w") as f:
    f.write("\n".join(f"synthetic://{i} {i % 3}" for i in range(4)))

pipe = lambda test: [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=2,
         test_mode=test),
    dict(type="Resize", scale=(32, 32), keep_ratio=False),
    dict(type="Normalize"),
    dict(type="FormatShape", input_format="NCHW"),
]

for path in [
    "configs/recognition/tsn/custom_backbones/"
    "tsn_rn101_32x4d_320p_1x1x3_100e_kinetics400_rgb.py",
    "configs/recognition/tsn/custom_backbones/"
    "tsn_dense161_320p_1x1x3_100e_kinetics400_rgb.py",
]:
    t0 = time.time()
    cfg = Config.fromfile(path).to_dict()
    cfg["model"]["cls_head"]["num_classes"] = 3
    cfg["model"]["cls_head"]["dropout_ratio"] = 0.0
    for split in ("train", "val", "test"):
        cfg["data"][split] = dict(type="VideoDataset", ann_file=ANN,
                                  pipeline=pipe(split != "train"))
    cfg["data"]["videos_per_gpu"] = 2
    cfg["data"]["workers_per_gpu"] = 1
    cfg["data"].pop("test_dataloader", None)
    cfg["total_epochs"] = 1
    cfg["evaluation"] = dict(interval=10)  # eval via run_evaluation below
    cfg["log_config"] = dict(interval=1)
    cfg["checkpoint_config"] = dict(interval=10)
    cfg["work_dir"] = f"/tmp/verify_wd_{path.split('/')[-1][:20]}"
    cfg.pop("load_from", None)
    state, history = train_model(cfg, validate=False, seed=0)
    loss = history[-1]["loss"]
    assert np.isfinite(loss), (path, loss)
    res = run_evaluation(cfg, params=state.params, split="test",
                         model_state=state.model_state)
    assert "top1_acc" in res and 0.0 <= res["top1_acc"] <= 1.0, res
    print(f"OK {path.split('/')[-1]}: loss={float(loss):.4f} "
          f"top1={res['top1_acc']:.3f}  ({time.time()-t0:.0f}s)", flush=True)
print("VERIFY DRIVE PASSED")
