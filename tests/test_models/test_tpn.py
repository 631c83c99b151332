"""TPN neck."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.necks.tpn import TPN
from adapt_image_models_tpu.models.builder import NECKS


def test_tpn_forward():
    neck = TPN(in_channels=(32, 64), out_channels=32, mid_channels=32,
               fusion_channels=64, downsample_scales=(8, 8),
               aux_head_classes=5)
    xs = (jnp.ones((2, 8, 8, 8, 32)), jnp.ones((2, 8, 4, 4, 64)))
    variables = neck.init(jax.random.PRNGKey(0), xs)
    fused, aux = neck.apply(variables, xs)
    assert fused.shape[0] == 2 and fused.shape[-1] == 64
    assert fused.shape[1] == 1  # T=8 pooled by scale 8
    assert aux.shape == (2, 5)
    assert bool(jnp.isfinite(fused).all())


def test_tpn_registered_and_parallel():
    assert "TPN" in NECKS
    neck = TPN(in_channels=(32, 64), out_channels=32, mid_channels=32,
               fusion_channels=64, downsample_scales=(4, 4),
               flow_type="parallel")
    xs = (jnp.ones((1, 8, 8, 8, 32)), jnp.ones((1, 8, 4, 4, 64)))
    variables = neck.init(jax.random.PRNGKey(0), xs)
    fused, aux = neck.apply(variables, xs)
    assert aux is None
    assert fused.shape[1] == 2
    with pytest.raises(ValueError, match="flow_type"):
        bad = TPN(in_channels=(32, 64), flow_type="zigzag",
                  mid_channels=32, fusion_channels=64)
        bad.init(jax.random.PRNGKey(0), xs)
