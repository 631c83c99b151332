"""Video Swin (3D) + plain 2D Swin baselines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.swin3d import (
    SwinTransformer3D, SwinTransformer2D, _relative_position_index_3d,
)


def test_relative_index_3d():
    idx = _relative_position_index_3d(2, 2, 2)
    assert idx.shape == (8, 8)
    assert idx.max() == 3 * 3 * 3 - 1
    assert (np.diag(idx) == idx[0, 0]).all()


def test_swin3d_forward():
    model = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=16,
                              depths=(2, 2), num_heads=(2, 4),
                              window_size=(2, 2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    # T'=2, final spatial 8/2=4, dim 32
    assert out.shape == (1, 2, 4, 4, 32)
    assert bool(jnp.isfinite(out).all())


def test_swin2d_forward():
    model = SwinTransformer2D(patch_size=4, embed_dim=16, depths=(2, 2),
                              num_heads=(2, 4), window_size=4)
    x = jnp.ones((2, 3, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 32)
