"""MobileNetV2(TSM), TANet, ResNet2Plus1d backbones."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.mobilenet import (
    MobileNetV2, MobileNetV2TSM, TANet, ResNet2Plus1d,
)
from adapt_image_models_tpu.models.common import TAM, Conv2plus1d


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet/conv execution dominates parts of this module on this host;
    optimized compiles (cached persistently) beat
    jax_disable_most_optimizations (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)



def test_mobilenetv2():
    from tests.util import zeros_init
    model = MobileNetV2()
    x = jnp.ones((2, 3, 64, 64))
    variables = zeros_init(model, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1280)


def test_mobilenetv2_tsm():
    from tests.util import zeros_init
    model = MobileNetV2TSM(num_frames=4)
    x = jnp.ones((4, 3, 64, 64))  # B=1, T=4
    variables = zeros_init(model, x)
    out = model.apply(variables, x)
    assert out.shape == (4, 1280)
    with pytest.raises(ValueError):
        MobileNetV2TSM().init(jax.random.PRNGKey(0), x)


def test_tam_module():
    tam = TAM(num_segments=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 6, 16))
    variables = tam.init(jax.random.PRNGKey(1), x)
    out = tam.apply(variables, x)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_tanet():
    from tests.util import zeros_init
    model = TANet(depth=50, num_segments=4)
    x = jnp.ones((4, 3, 32, 32))
    # shape-only test: zeros_init skips the init compile (depth-50 trace
    # + lowering is the cost on this 1-core host, not execution)
    variables = zeros_init(model, x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (4, 2048)


def test_conv2plus1d_param_budget():
    m = Conv2plus1d(out_channels=8, kernel_size=(3, 3, 3))
    x = jnp.ones((1, 4, 8, 8, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 4, 8, 8, 8)
    # mid channels per the (2+1)D parameter-matching formula
    mid = (3 * 3 * 3 * 4 * 8) // (3 * 3 * 4 + 3 * 8)
    k = variables["params"]["conv_s"]["kernel"]
    assert k.shape[-1] == mid


def test_resnet2plus1d():
    from tests.util import zeros_init
    model = ResNet2Plus1d(stage_blocks=(1, 1, 1, 1))
    x = jnp.ones((1, 3, 4, 32, 32))
    variables = zeros_init(model, x)
    out = model.apply(variables, x)
    assert out.shape[1] == 4 and out.shape[-1] == 512
