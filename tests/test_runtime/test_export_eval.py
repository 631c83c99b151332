"""Exported-artifact inference: serialize a tiny recognizer to StableHLO
and evaluate *through* the artifact (reference tools/test.py ONNX/TensorRT
paths, ``tools/test.py:172,222``); scores must match the flax eval path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jexport

from adapt_image_models_tpu.apis.test import (
    run_evaluation, run_exported_evaluation,
)
from adapt_image_models_tpu.models import build_model


def tiny_cfg(ann):
    pipe_test = [
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=2,
             test_mode=True),
        dict(type="Resize", scale=(-1, 32)),
        dict(type="CenterCrop", crop_size=32),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCTHW"),
    ]
    return dict(
        model=dict(
            type="Recognizer3D",
            backbone=dict(type="AIM", input_resolution=32, patch_size=16,
                          width=32, layers=1, heads=2, num_frames=4),
            cls_head=dict(type="I3DHead", num_classes=3, in_channels=32),
            test_cfg=dict(average_clips="prob"),
        ),
        data=dict(
            test_dataloader=dict(videos_per_gpu=1),
            test=dict(type="VideoDataset", ann_file=ann,
                      pipeline=pipe_test),
        ),
    )


@pytest.fixture
def ann(tmp_path):
    p = tmp_path / "ann.txt"
    p.write_text("\n".join(f"synthetic://{i} {i % 3}" for i in range(6)))
    return str(p)


def test_exported_eval_matches_flax_eval(tmp_path, ann):
    cfg = tiny_cfg(ann)
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg")
    model = build_model(model_cfg, test_cfg=test_cfg)
    x0 = jnp.zeros((1, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x0)

    exported = jexport.export(
        jax.jit(lambda x: model.apply(variables, x)))(
            jax.ShapeDtypeStruct((1, 3, 4, 32, 32), jnp.float32))
    path = str(tmp_path / "m.stablehlo")
    with open(path, "wb") as f:
        f.write(exported.serialize())

    res_art, scores_art, labels = run_exported_evaluation(
        cfg, path, split="test", return_scores=True)
    res_flax, scores_flax, _ = run_evaluation(
        cfg, params=variables["params"], split="test", return_scores=True)

    assert res_art.keys() == res_flax.keys()
    np.testing.assert_allclose(scores_art, scores_flax, atol=2e-3)
    np.testing.assert_allclose(scores_art.sum(-1), 1.0, atol=1e-3)


def test_exported_eval_pads_view_chunks(tmp_path, ann):
    """Artifact batch (2) not dividing the view count (3 clips) pads the
    last chunk and drops the padding."""
    cfg = tiny_cfg(ann)
    cfg["data"]["test"]["pipeline"][0]["num_clips"] = 3
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg")
    model = build_model(model_cfg, test_cfg=test_cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, 4, 32, 32)))
    exported = jexport.export(
        jax.jit(lambda x: model.apply(variables, x)))(
            jax.ShapeDtypeStruct((2, 3, 4, 32, 32), jnp.float32))
    path = str(tmp_path / "m2.stablehlo")
    with open(path, "wb") as f:
        f.write(exported.serialize())
    res = run_exported_evaluation(cfg, path, split="test")
    assert "top1_acc" in res and 0.0 <= res["top1_acc"] <= 1.0
