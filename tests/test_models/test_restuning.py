"""Res-tuning variant tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.restuning import (
    ViT_CLIP_RES_TUNING, ResTuningTransformer,
)


def tiny(**kw):
    cfg = dict(input_resolution=48, patch_size=16, width=64, layers=2,
               heads=4, num_frames=4, drop_path_rate=0.0)
    cfg.update(kw)
    return ViT_CLIP_RES_TUNING(**cfg)


@pytest.mark.parametrize("shift", [True, False])
def test_forward(shift):
    model = tiny(shift=shift)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 48, 48))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 64)
    assert bool(jnp.isfinite(out).all())


def test_side_stream_accumulates():
    """The res stream must be non-trivial with shift=True (even though the
    reference never merges it into the output)."""
    tr = ResTuningTransformer(layers=2, num_heads=4, num_frames=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 64))
    params = tr.init(jax.random.PRNGKey(1), x)
    out, x_res = tr.apply(params, x)
    assert out.shape == (4, 10, 64)
    assert x_res.shape == (4, 11, 64)
    assert float(jnp.abs(x_res).sum()) > 0


def test_clip_converter_fit():
    torch = pytest.importorskip("torch")
    from tests.golden.torch_aim_golden import GoldenAIM
    from adapt_image_models_tpu.convert import load_clip_into_params
    golden = GoldenAIM(res=48, patch=16, d=64, heads=4, layers=2, frames=4)
    clip_sd = {k: v for k, v in golden.state_dict().items()
               if "Adapter" not in k and "temporal_embedding" not in k}
    model = tiny()
    x = jnp.zeros((1, 3, 4, 48, 48))
    variables = model.init(jax.random.PRNGKey(0), x)
    merged = load_clip_into_params(variables["params"], clip_sd, layers=2,
                                   backbone_path=())
    out = model.apply({"params": merged}, x)
    assert out.shape == (1, 4, 64)
