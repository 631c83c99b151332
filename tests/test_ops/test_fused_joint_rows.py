"""Rows-tiled joint-MLP kernels (round 3): forward (eval + gated train)
and the backward kernel's cotangents, in Mosaic interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from adapt_image_models_tpu.ops.fused_joint_mlp import (
    _ref_impl, _ref_train_impl, fused_joint_mlp_rows,
    fused_joint_train_block,
)

B, L, D, DH = 2, 11, 32, 8
D4 = 4 * D
SCALE = 0.5


@pytest.fixture(scope="module")
def weights():
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    mk = lambda i, shape, s=0.1: jax.random.normal(ks[i], shape) * s
    return (mk(1, (D,)) + 1, mk(2, (D,)), mk(3, (D, D4)), mk(4, (D4,)),
            mk(5, (D4, D)), mk(6, (D,)), mk(7, (D, DH)), mk(8, (DH,)),
            mk(9, (DH, D)), mk(10, (D,)))


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.PRNGKey(42), (B, L, D), jnp.float32)


def test_rows_forward_matches_ref(weights, x):
    ref = _ref_impl(x, *weights, SCALE)
    with pltpu.force_tpu_interpret_mode():
        out = fused_joint_mlp_rows(x, *weights, SCALE, tile_rows=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)
        out2 = fused_joint_mlp_rows(x, *weights, SCALE, tile_rows=16,
                                    n_splits=2)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)


def test_rows_forward_gated(weights, x):
    gate = jnp.asarray(
        np.repeat([0.0, 1.0 / 0.9], L)[:B * L], jnp.float32)
    ref = _ref_train_impl(x, *weights, gate, SCALE)
    with pltpu.force_tpu_interpret_mode():
        out = fused_joint_mlp_rows(x, *weights, SCALE, gate=gate,
                                   tile_rows=16, n_splits=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_train_block_grads_match_xla(weights, x):
    """dx + adapter/gate cotangents must match autodiff of the XLA oracle;
    frozen-MLP/LN cotangents are zeros by contract."""
    gate = jnp.ones((B * L,), jnp.float32) / 0.9

    def loss_ref(x, w1, b1, w2, b2, gate):
        w = list(weights)
        w[6], w[7], w[8], w[9] = w1, b1, w2, b2
        y = _ref_train_impl(x, *w, gate, SCALE)
        return jnp.sum(y * jnp.cos(y))  # nontrivial cotangent

    def loss_kernel(x, w1, b1, w2, b2, gate):
        w = list(weights)
        w[6], w[7], w[8], w[9] = w1, b1, w2, b2
        y = fused_joint_train_block(x, *w[:6], w1, b1, w2, b2, gate, SCALE)
        return jnp.sum(y * jnp.cos(y))

    args = (x, weights[6], weights[7], weights[8], weights[9], gate)
    ref_grads = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    with pltpu.force_tpu_interpret_mode():
        ker_grads = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    names = ("dx", "dw1", "db1", "dw2", "db2", "dgate")
    for name, r, k in zip(names, ref_grads, ker_grads):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), atol=5e-3, rtol=5e-3,
            err_msg=name)


def test_train_block_frozen_cotangents_are_zero(weights, x):
    gate = jnp.ones((B * L,), jnp.float32)

    def loss(ln_s, w_fc):
        w = list(weights)
        w[0], w[2] = ln_s, w_fc
        y = fused_joint_train_block(x, *w[:6], *w[6:10], gate, SCALE)
        return jnp.sum(y ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_ln, g_fc = jax.jit(jax.grad(loss, argnums=(0, 1)))(weights[0], weights[2])
    assert float(jnp.abs(g_ln).max()) == 0.0
    assert float(jnp.abs(g_fc).max()) == 0.0


def test_rows_padding_modes_bit_identical(weights, x, monkeypatch):
    """The partial-row-tile hardening (round 5: unpadded partial tiles
    kernel-fault the v5e worker inside full train programs, PARITY.md)
    must be a pure layout change: padded and unpadded kernels agree
    bit-for-bit at a rows % tile != 0 geometry."""
    import adapt_image_models_tpu.ops.fused_joint_mlp as m

    assert (B * L) % 16 != 0  # geometry actually exercises the pad
    outs = {}
    for pad in (False, True):
        monkeypatch.setattr(m, "_PAD_ROWS", pad)
        with pltpu.force_tpu_interpret_mode():
            outs[pad] = np.asarray(fused_joint_mlp_rows(
                x, *weights, SCALE, tile_rows=16))
    np.testing.assert_array_equal(outs[False], outs[True])


def test_rows_bwd_padding_modes_bit_identical(weights, x, monkeypatch):
    import adapt_image_models_tpu.ops.fused_joint_mlp as m

    gate = (jnp.arange(B * L) % 3).astype(jnp.float32)
    grads = {}
    for pad in (False, True):
        monkeypatch.setattr(m, "_PAD_ROWS", pad)

        def loss(x_, w1, b1, w2, b2):
            y = fused_joint_train_block(
                x_, *weights[:6], w1, b1, w2, b2, gate, SCALE)
            return jnp.sum(y ** 2)

        with pltpu.force_tpu_interpret_mode():
            grads[pad] = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
                x, *weights[6:])
    for a, b_ in zip(grads[False], grads[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
