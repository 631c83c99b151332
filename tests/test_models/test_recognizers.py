"""Recognizer3D / head / loss shape tests (reference strategy:
tests/test_models/test_recognizers/)."""

import jax
import jax.numpy as jnp
import numpy as np

from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.models.recognizers.recognizer3d import average_clip
from adapt_image_models_tpu.models.losses import cross_entropy, soft_cross_entropy


def tiny_recognizer_cfg(num_classes=10):
    return dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=32, patch_size=16, width=64,
                      layers=2, heads=4, num_frames=4, drop_path_rate=0.0),
        cls_head=dict(type="I3DHead", num_classes=num_classes, in_channels=64,
                      dropout_ratio=0.5),
        test_cfg=dict(average_clips="prob"),
    )


def test_recognizer_train_forward():
    model = build_model(tiny_recognizer_cfg())
    x = jnp.ones((2, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 10)
    labels = jnp.array([1, 3])
    loss = cross_entropy(logits, labels)
    assert loss.shape == () and np.isfinite(float(loss))
    soft = jax.nn.one_hot(labels, 10)
    loss2 = soft_cross_entropy(logits, soft)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_recognizer_multiview_test():
    model = build_model(tiny_recognizer_cfg())
    x = jnp.ones((2, 3, 3, 4, 32, 32))  # (B, V, C, T, H, W)
    params = model.init(jax.random.PRNGKey(0), x[:, 0])
    scores = model.apply(params, x, method=model.forward_test)
    assert scores.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0, rtol=1e-5)


def test_average_clip_modes():
    logits = jnp.array([[1.0, 2.0], [3.0, 1.0], [0.0, 0.0], [2.0, 2.0]])
    # 2 samples x 2 views
    prob = average_clip(logits, 2, "prob")
    assert prob.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-6)
    score = average_clip(logits, 2, "score")
    np.testing.assert_allclose(np.asarray(score),
                               [[2.0, 1.5], [1.0, 1.0]], rtol=1e-6)
    ident = average_clip(logits, 1, None)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(logits))
