"""SlowFast + X3D backbones."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.slowfast import (
    ResNet3dSlowFast, X3D,
)
from adapt_image_models_tpu.models import build_model


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet/conv execution dominates parts of this module on this host;
    optimized compiles (cached persistently) beat
    jax_disable_most_optimizations (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)



def test_slowfast_forward():
    model = ResNet3dSlowFast(stage_blocks=(1, 1, 1, 1), alpha=4, beta_inv=8)
    x = jnp.ones((1, 3, 8, 32, 32))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    slow, fast = model.apply(variables, x)
    assert slow.shape[1] == 2  # T/alpha
    assert fast.shape[1] == 8
    assert slow.shape[-1] == 2048  # 64 * 2**3 * 4 (bottleneck expansion)
    assert fast.shape[-1] == 256   # 2048 / beta_inv
    with pytest.raises(ValueError, match="alpha"):
        model.apply(variables, jnp.ones((1, 3, 6, 32, 32)))


def test_slowfast_recognizer():
    cfg = dict(
        type="Recognizer3D",
        backbone=dict(type="ResNet3dSlowFast", stage_blocks=(1, 1, 1, 1),
                      alpha=4),
        cls_head=dict(type="SlowFastHead", num_classes=5,
                      in_channels=2048 + 256, dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    )
    model = build_model(cfg)
    x = jnp.ones((1, 3, 8, 32, 32))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 5)
    assert bool(jnp.isfinite(logits).all())


def test_x3d_forward():
    model = X3D(stage_blocks=(1, 1, 1, 1), gamma_d=1.0)
    x = jnp.ones((1, 3, 4, 64, 64))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    out = model.apply(variables, x)
    assert out.ndim == 5 and out.shape[1] == 4  # no temporal downsample
    assert bool(jnp.isfinite(out).all())


def test_slowfast_per_pathway_depths():
    """r101_r50-style recipes pair a deeper slow pathway with a shallower
    fast pathway (reference slowfast_r101_r50_4x16x1)."""
    from flax import traverse_util
    model = ResNet3dSlowFast(slow_stage_blocks=(1, 2, 1, 1),
                             fast_stage_blocks=(1, 1, 1, 1),
                             alpha=4, beta_inv=8)
    x = jnp.ones((1, 3, 8, 32, 32))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    keys = {"/".join(k) for k in
            traverse_util.flatten_dict(variables["params"])}
    assert "slow_path/layer2_1/conv1/kernel" in keys   # depth-2 stage 2
    assert "fast_path/layer2_1/conv1/kernel" not in keys
    slow, fast = model.apply(variables, x)
    assert slow.shape[-1] == 2048 and fast.shape[-1] == 256
