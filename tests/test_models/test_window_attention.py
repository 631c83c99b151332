"""AIM window-attention path + window utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.aim import AIM
from adapt_image_models_tpu.models.backbones.window import (
    window_partition, window_reverse, compute_shift_mask, get_window_size,
)


def test_partition_reverse_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4, 8))
    ws = (2, 2, 2)
    parts = window_partition(x, ws)
    assert parts.shape == (2 * 2 * 2 * 2, 8, 8)
    back = window_reverse(parts, ws, 2, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_get_window_size_clamps():
    ws, ss = get_window_size((8, 14, 14), (32, 2, 2), (16, 1, 1))
    assert ws == (8, 2, 2)
    assert ss == (0, 1, 1)


def test_shift_mask_blocks_cross_region():
    mask = compute_shift_mask(4, 4, 4, (2, 2, 2), (1, 1, 1))
    n_win = (4 // 2) ** 3
    assert mask.shape == (n_win, 8, 8)
    # some windows straddle region boundaries -> contain -100 entries
    assert (mask == -100.0).any()
    # diagonal always allowed
    for wi in range(n_win):
        assert (np.diag(mask[wi]) == 0).all()


def test_no_shift_mask_is_zero():
    # a pure-window config (shift 0) must not mask anything
    mask = compute_shift_mask(4, 4, 4, (2, 2, 2), (0, 0, 0))
    # with zero shift the reference slicing collapses to one region per axis
    assert (mask == 0).all()


def wind_model(**kw):
    cfg = dict(input_resolution=32, patch_size=16, width=64, layers=2,
               heads=4, num_frames=4, drop_path_rate=0.0, wind_attn=True,
               window_size=(4, 2, 2), not_shift=False)
    cfg.update(kw)
    return AIM(**cfg)


def test_window_forward_shapes():
    model = wind_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 64)
    assert bool(jnp.isfinite(out).all())


def test_window_no_prompt():
    model = wind_model(prompt=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 64)


def test_window_clip_converter_fit():
    torch = pytest.importorskip("torch")
    from tests.golden.torch_aim_golden import GoldenAIM
    from adapt_image_models_tpu.convert import load_clip_into_params
    golden = GoldenAIM(res=32, patch=16, d=64, heads=4, layers=2, frames=4)
    clip_sd = {k: v for k, v in golden.state_dict().items()
               if "Adapter" not in k and "temporal_embedding" not in k}
    model = wind_model()
    x = jnp.zeros((1, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    merged2 = load_clip_into_params(variables["params"], clip_sd, layers=2,
                                    backbone_path=())
    out = model.apply({"params": merged2}, x)
    assert out.shape == (1, 4, 64)
