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

    dref = jax.jit(jax.grad(loss_ref))(x)
    with pltpu.force_tpu_interpret_mode():
        grads = jax.jit(jax.grad(loss_frozen, argnums=tuple(range(7))))(x, *weights)
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

    dref = jax.jit(jax.grad(loss_ref))(x)
    with pltpu.force_tpu_interpret_mode():
        grads = jax.jit(jax.grad(loss_frozen, argnums=tuple(range(7))))(x, *weights)
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(dref),
                               atol=5e-3, rtol=5e-3)
    for gw in grads[1:]:
        assert float(jnp.abs(gw).max()) == 0.0


def test_fused_spatial_train_step_grads(weights):
    """Whole-step train op: dx + EXACT adapter cotangents must match
    autodiff of the XLA oracle (tanh-gelu adapter); frozen attn/LN = 0."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        fused_spatial_train_step,
    )
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    DH = 8
    w1 = jax.random.normal(ks[0], (D, DH)) * 0.1
    b1 = jax.random.normal(ks[1], (DH,)) * 0.1
    w2 = jax.random.normal(ks[2], (DH, D)) * 0.1
    b2 = jax.random.normal(ks[3], (D,)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(11), (B, L, D))
    gate = jnp.asarray([0.0, 1.0 / 0.9])

    def oracle(x, w1, b1, w2, b2, gate):
        y = _ref_ln_impl(x, *weights, H)
        pre = y @ w1 + b1
        a = jax.nn.gelu(pre, approximate=True)
        z = a @ w2 + b2
        branch = y + z  # skip_connect=True
        out = x + gate.reshape(-1, 1, 1) * branch
        return jnp.sum(jnp.sin(out))

    def kernel_loss(x, w1, b1, w2, b2, gate):
        out = fused_spatial_train_step(x, *weights, w1, b1, w2, b2, gate,
                                       H, True, None)
        return jnp.sum(jnp.sin(out))

    argnums = (0, 1, 2, 3, 4, 5)
    ref_grads = jax.jit(jax.grad(oracle, argnums=argnums))(x, w1, b1, w2, b2, gate)
    with pltpu.force_tpu_interpret_mode():
        # jit: eager interpret-mode grads re-dispatch the unrolled grid op
        # by op on every call; one jitted compile is persistent-cacheable
        ker_grads = jax.jit(jax.grad(kernel_loss, argnums=argnums))(
            x, w1, b1, w2, b2, gate)
    for name, r, k in zip(("dx", "dw1", "db1", "dw2", "db2", "dgate"),
                          ref_grads, ker_grads):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   atol=7e-3, rtol=7e-3, err_msg=name)

    # ungated (spatial AIM step): frozen weights get zero cotangents
    def kernel_loss_nogate(lns, wqkv):
        w = (lns, *weights[1:2], wqkv, *weights[3:])
        out = fused_spatial_train_step(x, *w, w1, b1, w2, b2, None,
                                       H, True, None)
        return jnp.sum(out ** 2)

    with pltpu.force_tpu_interpret_mode():
        gl, gw = jax.jit(jax.grad(kernel_loss_nogate, argnums=(0, 1)))(
            weights[0], weights[2])
    assert float(jnp.abs(gl).max()) == 0.0
    assert float(jnp.abs(gw).max()) == 0.0


def test_fused_temporal_train_step_grads(weights):
    """Temporal whole-step train op: dx + exact adapter cotangents +
    per-sample-frame gate cotangent vs the XLA oracle."""
    from adapt_image_models_tpu.ops.fused_temporal_attention import (
        fused_temporal_train_step,
    )
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    DH = 8
    w1 = jax.random.normal(ks[0], (D, DH)) * 0.1
    b1 = jax.random.normal(ks[1], (DH,)) * 0.1
    w2 = jax.random.normal(ks[2], (DH, D)) * 0.1
    b2 = jax.random.normal(ks[3], (D,)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(12), (B * T, L, D))
    gate = jnp.asarray(
        np.random.default_rng(0).choice([0.0, 1.0 / 0.9], B * T),
        jnp.float32)

    def oracle(x, w1, b1, w2, b2, gate):
        y = fta._ref_ln_impl(x, *weights, T, H)
        pre = y @ w1 + b1
        a = jax.nn.gelu(pre, approximate=True)
        z = a @ w2 + b2  # skip_connect=False (T_Adapter)
        out = x + gate.reshape(-1, 1, 1) * z
        return jnp.sum(jnp.sin(out))

    def kernel_loss(x, w1, b1, w2, b2, gate):
        out = fused_temporal_train_step(x, *weights, w1, b1, w2, b2, gate,
                                        T, H, False)
        return jnp.sum(jnp.sin(out))

    argnums = (0, 1, 2, 3, 4, 5)
    ref_grads = jax.jit(jax.grad(oracle, argnums=argnums))(x, w1, b1, w2, b2, gate)
    with pltpu.force_tpu_interpret_mode():
        # jit: eager interpret-mode grads re-dispatch the unrolled grid op
        # by op on every call; one jitted compile is persistent-cacheable
        ker_grads = jax.jit(jax.grad(kernel_loss, argnums=argnums))(
            x, w1, b1, w2, b2, gate)
    for name, r, k in zip(("dx", "dw1", "db1", "dw2", "db2", "dgate"),
                          ref_grads, ker_grads):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   atol=7e-3, rtol=7e-3, err_msg=name)


def test_fused_spatial_train_step_vitl_fallback_grads(weights, monkeypatch):
    """The two-kernel ViT-L fallback path must produce the same cotangents
    as the single-kernel path (forced via the VMEM gate)."""
    from adapt_image_models_tpu.ops import fused_qkv_attention as fqa
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    DH = 8
    w1 = jax.random.normal(ks[0], (D, DH)) * 0.1
    b1 = jax.random.normal(ks[1], (DH,)) * 0.1
    w2 = jax.random.normal(ks[2], (DH, D)) * 0.1
    b2 = jax.random.normal(ks[3], (D,)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(13), (B, L, D))
    gate = jnp.asarray([1.0, 1.0 / 0.9])

    def loss(x, w1, b1, w2, b2, gate):
        out = fqa.fused_spatial_train_step(x, *weights, w1, b1, w2, b2,
                                           gate, H, True, None)
        return jnp.sum(jnp.sin(out))

    argnums = (0, 1, 2, 3, 4, 5)
    with pltpu.force_tpu_interpret_mode():
        g_kernel = jax.jit(jax.grad(loss, argnums=argnums))(x, w1, b1, w2, b2, gate)
        monkeypatch.setattr(fqa, "_step_vmem_fits", lambda *a: False)
        g_fallback = jax.jit(jax.grad(loss, argnums=argnums))(x, w1, b1, w2, b2,
                                                     gate)
    for name, a_, b_ in zip(("dx", "dw1", "db1", "dw2", "db2", "dgate"),
                            g_kernel, g_fallback):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                   atol=5e-3, rtol=5e-3, err_msg=name)


def _long_clip_fallback_check(weights, T32):
    """T > LONG_CLIP_T takes the two-kernel composition backward (whole-step
    cell exceeds VMEM at T=32); cotangents must match the oracle."""
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    DH = 8
    w1 = jax.random.normal(ks[0], (D, DH)) * 0.1
    b1 = jax.random.normal(ks[1], (DH,)) * 0.1
    w2 = jax.random.normal(ks[2], (DH, D)) * 0.1
    b2 = jax.random.normal(ks[3], (D,)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(14), (T32, 5, D))
    gate = jnp.asarray(
        np.random.default_rng(1).choice([0.0, 1.0], T32), jnp.float32)

    def oracle(x, w1, b1, w2, b2, gate):
        y = fta._ref_ln_impl(x, *weights, T32, H)
        pre = y @ w1 + b1
        z = jax.nn.gelu(pre, approximate=True) @ w2 + b2
        out = x + gate.reshape(-1, 1, 1) * z
        return jnp.sum(jnp.sin(out))

    def kernel_loss(x, w1, b1, w2, b2, gate):
        out = fta.fused_temporal_train_step(x, *weights, w1, b1, w2, b2,
                                            gate, T32, H, False)
        return jnp.sum(jnp.sin(out))

    argnums = (0, 1, 2, 3, 4, 5)
    ref_grads = jax.jit(jax.grad(oracle, argnums=argnums))(x, w1, b1, w2, b2, gate)
    with pltpu.force_tpu_interpret_mode():
        # jit: eager interpret-mode grads re-dispatch the unrolled grid op
        # by op on every call; one jitted compile is persistent-cacheable
        ker_grads = jax.jit(jax.grad(kernel_loss, argnums=argnums))(
            x, w1, b1, w2, b2, gate)
    for name, r, k in zip(("dx", "dw1", "db1", "dw2", "db2", "dgate"),
                          ref_grads, ker_grads):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   atol=1e-2, rtol=1e-2, err_msg=name)


def test_fused_temporal_train_step_long_clip_fallback(weights, monkeypatch):
    """Same fallback code path at a lowered cutover — interpret mode unrolls
    the grid into the traced jaxpr, so true T=18 traces for ~45 s."""
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    monkeypatch.setattr(fta, "LONG_CLIP_T", 4)
    monkeypatch.setattr(fta, "STEP_BWD_MAX_T", 4)
    _long_clip_fallback_check(weights, T32=6)


def test_fused_temporal_train_step_composition_full_core(weights,
                                                         monkeypatch):
    """Composition backward with the FULL core (whole-step cell gated out
    but LONG_CLIP_T still above T): the dX dispatch must pick the
    full-core dX-only kernel and still match the oracle."""
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    monkeypatch.setattr(fta, "STEP_BWD_MAX_T", 4)
    _long_clip_fallback_check(weights, T32=6)


@pytest.mark.slow
def test_fused_temporal_train_step_long_clip_fallback_true_threshold(weights):
    _long_clip_fallback_check(weights, T32=18)


def test_fused_temporal_train_step_long_clip_no_gate(weights, monkeypatch):
    """gate=None (drop_path 0) on the long-clip path: the emit_u forward
    rides an all-ones gate and the backward must still match the oracle
    (no dgate output)."""
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    monkeypatch.setattr(fta, "LONG_CLIP_T", 4)
    monkeypatch.setattr(fta, "STEP_BWD_MAX_T", 4)
    T6 = 6
    ks = jax.random.split(jax.random.PRNGKey(8), 4)
    DH = 8
    w1 = jax.random.normal(ks[0], (D, DH)) * 0.1
    b1 = jax.random.normal(ks[1], (DH,)) * 0.1
    w2 = jax.random.normal(ks[2], (DH, D)) * 0.1
    b2 = jax.random.normal(ks[3], (D,)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(15), (T6, 5, D))

    def oracle(x, w1, b1, w2, b2):
        y = fta._ref_ln_impl(x, *weights, T6, H)
        pre = y @ w1 + b1
        z = jax.nn.gelu(pre, approximate=True) @ w2 + b2
        return jnp.sum(jnp.sin(x + z))

    def kernel_loss(x, w1, b1, w2, b2):
        out = fta.fused_temporal_train_step(x, *weights, w1, b1, w2, b2,
                                            None, T6, H, False)
        return jnp.sum(jnp.sin(out))

    argnums = (0, 1, 2, 3, 4)
    ref = jax.jit(jax.grad(oracle, argnums=argnums))(x, w1, b1, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.grad(kernel_loss, argnums=argnums))(
            x, w1, b1, w2, b2)
    for name, r, k in zip(("dx", "dw1", "db1", "dw2", "db2"), ref, got):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r), atol=1e-2,
                                   rtol=1e-2, err_msg=name)
