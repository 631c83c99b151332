"""Fork ViT_CLIP variant: shapes, patch-shift algebra, converter fit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.vit_clip import (
    ViT_CLIP, patch_shift,
)


def tiny(**kw):
    cfg = dict(input_resolution=48, patch_size=16, width=64, layers=2,
               heads=4, num_frames=4, drop_path_rate=0.0)
    cfg.update(kw)
    return ViT_CLIP(**cfg)


def test_forward_shape_lambda_blend():
    model = tiny(shift=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 48, 48))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 64)
    assert bool(jnp.isfinite(out).all())


def test_forward_shape_patch_shift():
    model = tiny(shift=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 48, 48))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 64)
    assert bool(jnp.isfinite(out).all())


def test_patch_shift_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 9, 9, 8))
    y = patch_shift(x)
    # inverse shift undoes the pattern
    z = patch_shift(y, inv=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), rtol=1e-6)
    # (0,0) cells rolled by -4 along T
    np.testing.assert_allclose(np.asarray(y[:, :, 0, 0]),
                               np.asarray(jnp.roll(x[:, :, 0, 0], -4, axis=1)),
                               rtol=1e-6)
    # center (1,1) cells unshifted
    np.testing.assert_allclose(np.asarray(y[:, :, 1, 1]),
                               np.asarray(x[:, :, 1, 1]), rtol=1e-6)


def test_clip_converter_fits_vit_clip():
    """The CLIP key map must land in ViT_CLIP exactly like in AIM."""
    torch = pytest.importorskip("torch")
    from tests.golden.torch_aim_golden import GoldenAIM
    from adapt_image_models_tpu.convert import load_clip_into_params

    golden = GoldenAIM(res=48, patch=16, d=64, heads=4, layers=2, frames=4)
    clip_sd = {k: v for k, v in golden.state_dict().items()
               if "Adapter" not in k and "temporal_embedding" not in k}
    model = tiny(shift=False)
    x = jnp.zeros((1, 3, 4, 48, 48))
    variables = model.init(jax.random.PRNGKey(0), x)
    merged = load_clip_into_params(variables["params"], clip_sd, layers=2,
                                   backbone_path=())
    out = model.apply({"params": merged}, x)
    assert out.shape == (1, 4, 64)
