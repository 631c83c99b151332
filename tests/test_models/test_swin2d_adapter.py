"""Swin2D-Adapter backbone tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.swin2d_adapter import (
    SwinTransformer2D_Adapter, _relative_position_index, _shift_mask_2d,
    _window_partition_2d, _window_reverse_2d,
)
from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.parallel.partition import partition_params


def test_relative_position_index():
    idx = _relative_position_index(3, 3)
    assert idx.shape == (9, 9)
    assert idx.max() == (2 * 3 - 1) * (2 * 3 - 1) - 1
    assert (np.diag(idx) == idx[0, 0]).all()  # self-offsets identical


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 5))
    parts = _window_partition_2d(x, 4)
    assert parts.shape == (2 * 4, 16, 5)
    back = _window_reverse_2d(parts, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_shift_mask():
    m = _shift_mask_2d(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == -100.0).any()
    for w in range(4):
        assert (np.diag(m[w]) == 0).all()


def tiny_swin(**kw):
    cfg = dict(img_size=32, patch_size=(2, 4, 4), num_frames=4, embed_dim=16,
               depths=(2, 2), num_heads=(2, 4), window_size=4,
               drop_path_rate=0.1)
    cfg.update(kw)
    return SwinTransformer2D_Adapter(**cfg)


def test_swin_forward():
    model = tiny_swin()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    # T' = 4/2, final res = 8/2 = 4, final dim = 16*2
    assert out.shape == (2, 2, 4, 4, 32)
    assert bool(jnp.isfinite(out).all())


def test_swin_recognizer_and_partition():
    cfg = dict(
        type="Recognizer3D",
        backbone=dict(type="SwinTransformer2D_Adapter", img_size=32,
                      patch_size=(2, 4, 4), num_frames=4, embed_dim=16,
                      depths=(2, 2), num_heads=(2, 4), window_size=4),
        cls_head=dict(type="I3DHead", num_classes=7, in_channels=32,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    )
    model = build_model(cfg)
    x = jnp.ones((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 7)
    trainable, frozen = partition_params(params["params"])
    names = {"/".join(k) for k in
             __import__("flax").traverse_util.flatten_dict(trainable)}
    assert any("T_Adapter" in n for n in names)
    assert any("temporal_position_bias_table" in n for n in names)
    assert not any("qkv" in n for n in names)  # frozen swin weights


def test_swin_temporal_embedding_mode():
    model = tiny_swin(t_relative=False)
    x = jnp.ones((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2, 4, 4, 32)
