"""GradCAM, PreciseBN and the inference API (reference
tests/test_models/test_gradcam.py, test_runtime/test_precise_bn.py,
test_runtime/test_inference.py analogs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models import build_model

TINY = dict(
    type="Recognizer3D",
    backbone=dict(type="AIM", input_resolution=32, patch_size=16,
                  width=32, layers=1, heads=2, num_frames=4),
    cls_head=dict(type="I3DHead", num_classes=3, in_channels=32),
    test_cfg=dict(average_clips="prob"),
)


def test_gradcam_shapes_and_range():
    from adapt_image_models_tpu.utils.gradcam import gradcam
    model_cfg = dict(TINY)
    test_cfg = model_cfg.pop("test_cfg")
    model = build_model(model_cfg, test_cfg=test_cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    cam, scores = gradcam(model, params, x)
    assert cam.shape == (2, 4, 32, 32)
    assert scores.shape == (2, 3)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0 + 1e-6
    np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0, atol=1e-5)
    # explicit target class also works
    cam2, _ = gradcam(model, params, x, target_class=1)
    assert cam2.shape == cam.shape


def test_precise_bn_recovers_population_stats():
    """Feeding constant-distribution batches must converge BN stats to the
    data's moments (reference fvcore PreciseBN semantics)."""
    from adapt_image_models_tpu.utils.precise_bn import (
        compute_precise_bn_stats,
    )
    import flax.linen as nn

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            h = nn.Dense(8)(x)
            h = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9)(h)
            return nn.Dense(3)(h)

    model = BNNet()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(2.0, 3.0, (64, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    params = variables["params"]
    state = {"batch_stats": variables["batch_stats"]}

    batches = [dict(imgs=rng.normal(2.0, 3.0, (64, 8)).astype(np.float32))
               for _ in range(8)]
    new_state = compute_precise_bn_stats(
        model, params, state, batches, prepare_fn=lambda v: v, num_iters=8)
    flat = new_state["batch_stats"]["BatchNorm_0"]
    # dense layer output mean/var: just check the stats moved off init
    # (zeros/ones) toward the empirical batch moments
    mean = np.asarray(flat["mean"])
    var = np.asarray(flat["var"])
    assert np.abs(mean).max() > 0.1  # moved off the zero init
    assert np.abs(var - 1.0).max() > 0.1
    # and they match the population moments of the dense output:
    # E[out] = E[x] @ W + b with E[x] = 2 (channel noise ~0.15 after
    # averaging 8 batches of 64)
    expected = 2.0 * np.asarray(params["Dense_0"]["kernel"]).sum(0) \
        + np.asarray(params["Dense_0"]["bias"])
    np.testing.assert_allclose(mean, expected, atol=0.6)


def test_precise_bn_noop_without_bn():
    from adapt_image_models_tpu.utils.precise_bn import (
        compute_precise_bn_stats,
    )
    state = {}
    out = compute_precise_bn_stats(None, None, state, [], lambda v: v)
    assert out is state


def test_inference_recognizer_synthetic_video():
    from adapt_image_models_tpu.apis.inference import (
        init_recognizer, inference_recognizer,
    )
    cfg = dict(
        model=TINY,
        data=dict(test=dict(type="VideoDataset", ann_file="unused",
                            pipeline=[
            dict(type="SampleFrames", clip_len=4, frame_interval=1,
                 num_clips=2, test_mode=True),
            dict(type="Resize", scale=(32, 32), keep_ratio=False),
            dict(type="Normalize"),
            dict(type="FormatShape", input_format="NCTHW"),
        ])),
    )
    model, params = init_recognizer(cfg)
    results = inference_recognizer(model, params, cfg, "synthetic://7",
                                   topk=2)
    assert len(results) == 2
    (c0, s0), (c1, s1) = results
    assert 0 <= c0 < 3 and s0 >= s1
    # feature extraction mode
    results2, feats = inference_recognizer(model, params, cfg,
                                           "synthetic://7", topk=1,
                                           return_features=True)
    assert feats.shape[0] == 2  # num_clips views


def test_max_testing_views_rejected_for_segment_layout():
    """max_testing_views is a 3D-only test_cfg option (reference
    recognizer3d.py); the 2D consensus head needs all segments at once, so
    the combination must raise instead of silently dropping the chunking."""
    from adapt_image_models_tpu.apis.test import make_chunked_eval_step
    with pytest.raises(ValueError, match="segment"):
        make_chunked_eval_step(None, lambda x: x, max_testing_views=2,
                               segment_layout=True)
