"""dX-only (frozen) attention backwards: dx must equal the exact VJP's dx;
weight/LN cotangents are zeros by contract (AIM freeze regime)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from adapt_image_models_tpu.ops.fused_qkv_attention import (
    _ref_ln_impl, fused_ln_attention_block_frozen,
)
from adapt_image_models_tpu.ops import fused_temporal_attention as fta

B, L, D, H, T = 2, 13, 32, 4, 4


@pytest.fixture(scope="module")
def weights():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    mk = lambda i, shape, s=0.1: jax.random.normal(ks[i], shape) * s
    return (mk(1, (D,)) + 1, mk(2, (D,)), mk(3, (D, 3 * D)), mk(4, (3 * D,)),
            mk(5, (D, D)), mk(6, (D,)))


def test_frozen_spatial_dx_matches_exact(weights):
    x = jax.random.normal(jax.random.PRNGKey(9), (B, L, D))

    def loss_ref(x):
        y = _ref_ln_impl(x, *weights, H)
        return jnp.sum(jnp.sin(y))

    def loss_frozen(x, *w):
        y = fused_ln_attention_block_frozen(x, *w, H)
        return jnp.sum(jnp.sin(y))

    dref = jax.grad(loss_ref)(x)
    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(loss_frozen, argnums=tuple(range(7)))(x, *weights)
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(dref),
                               atol=5e-3, rtol=5e-3)
    for gw in grads[1:]:
        assert float(jnp.abs(gw).max()) == 0.0


def test_frozen_temporal_dx_matches_exact(weights):
    x = jax.random.normal(jax.random.PRNGKey(10), (B * T, L, D))

    def loss_ref(x):
        y = fta._ref_ln_impl(x, *weights, T, H)
        return jnp.sum(jnp.sin(y))

    def loss_frozen(x, *w):
        y = fta.fused_ln_temporal_block_frozen(x, *w, T, H)
        return jnp.sum(jnp.sin(y))

    dref = jax.grad(loss_ref)(x)
    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(loss_frozen, argnums=tuple(range(7)))(x, *weights)
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(dref),
                               atol=5e-3, rtol=5e-3)
    for gw in grads[1:]:
        assert float(jnp.abs(gw).max()) == 0.0
