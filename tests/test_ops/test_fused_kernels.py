"""Pallas kernel correctness vs the XLA reference math.

Runs in Mosaic interpret mode so the CPU test mesh covers the kernel logic;
the compiled-TPU path is exercised by bench.py and the verify drives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from adapt_image_models_tpu.models.layers import xla_attention_core
from adapt_image_models_tpu.ops.flash_attention import flash_attention_core
from adapt_image_models_tpu.ops.fused_qkv_attention import (
    fused_qkv_attention, _ref_impl as ref_qkv,
)
from adapt_image_models_tpu.ops.fused_temporal_attention import (
    fused_temporal_attention, _ref_impl as ref_temporal,
)

B, H, L, D, T = 4, 2, 37, 64, 4  # deliberately unaligned L


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_flash_attention_core_interpret():
    q = _rand((B, H, L, D // H), 0)
    k = _rand((B, H, L, D // H), 1)
    v = _rand((B, H, L, D // H), 2)
    ref = xla_attention_core(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_core(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_qkv_attention_interpret():
    x = _rand((B, L, D), 0)
    wqkv = _rand((D, 3 * D), 1) * 0.05
    bqkv = _rand((3 * D,), 2) * 0.05
    wout = _rand((D, D), 3) * 0.05
    bout = _rand((D,), 4) * 0.05
    ref = ref_qkv(x, wqkv, bqkv, wout, bout, H)
    with pltpu.force_tpu_interpret_mode():
        out = fused_qkv_attention(x, wqkv, bqkv, wout, bout, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_temporal_attention_interpret():
    x = _rand((B * T, L, D), 0)
    wqkv = _rand((D, 3 * D), 1) * 0.05
    bqkv = _rand((3 * D,), 2) * 0.05
    wout = _rand((D, D), 3) * 0.05
    bout = _rand((D,), 4) * 0.05
    ref = ref_temporal(x, wqkv, bqkv, wout, bout, T, H)
    with pltpu.force_tpu_interpret_mode():
        out = fused_temporal_attention(x, wqkv, bqkv, wout, bout, T, H,
                                       tile=64)
    # the kernel rounds the elementwise q*k products to bf16 before the
    # segment-sum matmul (the XLA ref accumulates exact bf16 products in
    # fp32), so tolerance is bf16-level; full-model bf16 logits agree to
    # 2.8e-3 with identical argmax (see the fused-vs-xla verify drive)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # and the error is unbiased/small in aggregate
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    assert err < 2e-3, err


def test_fused_ln_qkv_attention_interpret():
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        fused_ln_qkv_attention, _ref_ln_impl,
    )
    x = _rand((B, L, D), 0)
    lns = 1.0 + 0.1 * _rand((D,), 7)
    lnb = 0.1 * _rand((D,), 8)
    wqkv = _rand((D, 3 * D), 1) * 0.05
    bqkv = _rand((3 * D,), 2) * 0.05
    wout = _rand((D, D), 3) * 0.05
    bout = _rand((D,), 4) * 0.05
    ref = _ref_ln_impl(x, lns, lnb, wqkv, bqkv, wout, bout, H)
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_qkv_attention(x, lns, lnb, wqkv, bqkv, wout, bout, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_ln_temporal_attention_interpret():
    from adapt_image_models_tpu.ops.fused_temporal_attention import (
        fused_ln_temporal_attention, _ref_ln_impl as ref_ln_temporal,
    )
    x = _rand((B * T, L, D), 0)
    lns = 1.0 + 0.1 * _rand((D,), 7)
    lnb = 0.1 * _rand((D,), 8)
    wqkv = _rand((D, 3 * D), 1) * 0.05
    bqkv = _rand((3 * D,), 2) * 0.05
    wout = _rand((D, D), 3) * 0.05
    bout = _rand((D,), 4) * 0.05
    ref = ref_ln_temporal(x, lns, lnb, wqkv, bqkv, wout, bout, T, H)
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_temporal_attention(x, lns, lnb, wqkv, bqkv, wout,
                                          bout, T, H, tile=16)
    # tile=16 splits the bf16 segment-sum reductions differently from the
    # einsum reference -> rounding differences slightly above 2e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1.5e-3, atol=1.5e-3)


def test_fused_qkv_attention_l_actual_masks_keys():
    """With l_actual < L the extra key rows must not influence real rows."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import _ref_impl
    x = _rand((B, L, D), 0)
    wqkv = _rand((D, 3 * D), 1) * 0.05
    bqkv = _rand((3 * D,), 2) * 0.05
    wout = _rand((D, D), 3) * 0.05
    bout = _rand((D,), 4) * 0.05
    l_act = 30
    ref = _ref_impl(x[:, :l_act], wqkv, bqkv, wout, bout, H)
    with pltpu.force_tpu_interpret_mode():
        out = fused_qkv_attention(x, wqkv, bqkv, wout, bout, H,
                                  l_actual=l_act)
    np.testing.assert_allclose(np.asarray(out[:, :l_act]), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_ln_attention_block_grads():
    """Custom-VJP backward of the LN-fused block vs direct XLA autodiff."""
    import jax
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        fused_ln_attention_block, _ref_ln_impl,
    )
    x = _rand((2, 19, D), 0)
    lns = 1.0 + 0.1 * _rand((D,), 7)
    lnb = 0.1 * _rand((D,), 8)
    wqkv = _rand((D, 3 * D), 1) * 0.05
    bqkv = _rand((3 * D,), 2) * 0.05
    wout = _rand((D, D), 3) * 0.05
    bout = _rand((D,), 4) * 0.05

    def loss_fused(*a):
        return jnp.sum(fused_ln_attention_block(*a, H) ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref_ln_impl(*a, H) ** 2)

    args = (x, lns, lnb, wqkv, bqkv, wout, bout)
    # interpret mode must cover the backward too (it is a Pallas kernel now)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(*args)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_fused_joint_mlp_adapter_interpret():
    from adapt_image_models_tpu.ops.fused_joint_mlp import (
        fused_joint_mlp_adapter, _ref_impl as ref_joint,
    )
    x = _rand((B, L, D), 0)
    lns = 1.0 + 0.1 * _rand((D,), 1)
    lnb = 0.1 * _rand((D,), 2)
    wfc = _rand((D, 4 * D), 3) * 0.05
    bfc = _rand((4 * D,), 4) * 0.05
    wproj = _rand((4 * D, D), 5) * 0.05
    bproj = _rand((D,), 6) * 0.05
    w1 = _rand((D, D // 4), 7) * 0.05
    b1 = _rand((D // 4,), 8) * 0.05
    w2 = _rand((D // 4, D), 9) * 0.05
    b2 = _rand((D,), 10) * 0.05
    ref = ref_joint(x, lns, lnb, wfc, bfc, wproj, bproj, w1, b1, w2, b2, 0.5)
    with pltpu.force_tpu_interpret_mode():
        out = fused_joint_mlp_adapter(x, lns, lnb, wfc, bfc, wproj, bproj,
                                      w1, b1, w2, b2, 0.5, tile_m=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_fused_joint_block_grads():
    import jax
    from adapt_image_models_tpu.ops.fused_joint_mlp import (
        fused_joint_block, _ref_impl as ref_joint,
    )
    x = _rand((2, 19, D), 0)
    lns = 1.0 + 0.1 * _rand((D,), 1)
    lnb = 0.1 * _rand((D,), 2)
    wfc = _rand((D, 4 * D), 3) * 0.05
    bfc = _rand((4 * D,), 4) * 0.05
    wproj = _rand((4 * D, D), 5) * 0.05
    bproj = _rand((D,), 6) * 0.05
    w1 = _rand((D, D // 4), 7) * 0.05
    b1 = _rand((D // 4,), 8) * 0.05
    w2 = _rand((D // 4, D), 9) * 0.05
    b2 = _rand((D,), 10) * 0.05
    args = (x, lns, lnb, wfc, bfc, wproj, bproj, w1, b1, w2, b2)

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_joint_block(*a, 0.5) ** 2)

    def loss_ref(*a):
        return jnp.sum(ref_joint(*a, 0.5) ** 2)

    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 7, 9)))(*args)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 7, 9)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_fused_step_blocks_interpret():
    """Whole-step kernels (LN + attn + adapter + residual) vs XLA refs."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        fused_ln_attn_adapter_residual,
        _ref_ln_adapter_res_impl as ref_spatial_step,
    )
    from adapt_image_models_tpu.ops.fused_temporal_attention import (
        fused_ln_temporal_adapter_residual,
        _ref_ln_adapter_res_impl as ref_temporal_step,
    )
    lns = 1.0 + 0.1 * _rand((D,), 1)
    lnb = 0.1 * _rand((D,), 2)
    wqkv = _rand((D, 3 * D), 3) * 0.05
    bqkv = _rand((3 * D,), 4) * 0.05
    wout = _rand((D, D), 5) * 0.05
    bout = _rand((D,), 6) * 0.05
    w1 = _rand((D, D // 4), 7) * 0.05
    b1 = _rand((D // 4,), 8) * 0.05
    w2 = _rand((D // 4, D), 9) * 0.05
    b2 = _rand((D,), 10) * 0.05
    ws = (wqkv, bqkv, wout, bout, w1, b1, w2, b2)

    x = _rand((B, L, D), 0)
    for skip in (True, False):
        ref = ref_spatial_step(x, lns, lnb, *ws, H, skip)
        with pltpu.force_tpu_interpret_mode():
            out = fused_ln_attn_adapter_residual(x, lns, lnb, *ws, H, skip)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)

    xt = _rand((B * T, L, D), 0)
    ref = ref_temporal_step(xt, lns, lnb, *ws, T, H, False)
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_temporal_adapter_residual(xt, lns, lnb, *ws, T, H,
                                                 False, tile=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_ln_attention_backward_matches_xla_vjp():
    """The Pallas backward core (_bwd_ln_pallas) must produce the exact
    cotangents of the XLA-remat backward (_bwd_ln) — every input, weight,
    bias and LN-param gradient."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _bwd_ln, _bwd_ln_pallas, _ref_ln_impl,
    )
    heads, l, d = 2, 37, 64
    lq = 48  # padded token count the backbone carries (l_actual = 37)
    x = _rand((B, lq, d), 0)
    # real rows only; padded rows zero like the backbone produces
    row = np.arange(lq)[None, :, None]
    x = jnp.where(jnp.asarray(row) < l, x, 0.0)
    lns = 1.0 + 0.1 * _rand((d,), 1)
    lnb = 0.1 * _rand((d,), 2)
    wqkv = _rand((d, 3 * d), 3) * 0.1
    bqkv = 0.1 * _rand((3 * d,), 4)
    wout = _rand((d, d), 5) * 0.1
    bout = 0.1 * _rand((d,), 6)
    g = _rand((B, lq, d), 7)
    g = jnp.where(jnp.asarray(row) < l, g, 0.0)

    res = (x, lns, lnb, wqkv, bqkv, wout, bout)
    ref = _bwd_ln(heads, l, res, g)
    with pltpu.force_tpu_interpret_mode():
        got = _bwd_ln_pallas(heads, l, res, g)
    names = ("dx", "dgamma", "dbeta", "dwqkv", "dbqkv", "dwout", "dbout")
    assert len(ref) == len(got) == 7
    for name, r, o in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_ln_attention_backward_grad_check():
    """End-to-end jax.grad through the kernel-backed custom_vjp equals
    grad through the pure XLA reference (finite scalar loss)."""
    from adapt_image_models_tpu.ops import fused_qkv_attention as fqa
    heads, l, d = 2, 24, 32
    x = _rand((2, l, d), 0)
    lns = jnp.ones((d,))
    lnb = jnp.zeros((d,))
    wqkv = _rand((d, 3 * d), 3) * 0.2
    bqkv = jnp.zeros((3 * d,))
    wout = _rand((d, d), 5) * 0.2
    bout = jnp.zeros((d,))

    def loss_ref(x):
        return jnp.sum(fqa._ref_ln_impl(x, lns, lnb, wqkv, bqkv, wout,
                                        bout, heads, l) ** 2)

    def loss_kernel(x):
        y = fqa.fused_ln_attention_block(x, lns, lnb, wqkv, bqkv, wout,
                                         bout, heads, l)
        return jnp.sum(y ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(x)
    with pltpu.force_tpu_interpret_mode():
        g_kernel = jax.jit(jax.grad(loss_kernel))(x)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_pallas_temporal_ln_backward_matches_xla_vjp():
    """Temporal LN+attention Pallas backward vs the XLA-remat cotangents."""
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    t, heads, n, d = 4, 2, 37, 64
    b = 3
    x = _rand((b * t, n, d), 0)
    lns = 1.0 + 0.1 * _rand((d,), 1)
    lnb = 0.1 * _rand((d,), 2)
    wqkv = _rand((d, 3 * d), 3) * 0.1
    bqkv = 0.1 * _rand((3 * d,), 4)
    wout = _rand((d, d), 5) * 0.1
    bout = 0.1 * _rand((d,), 6)
    g = _rand((b * t, n, d), 7)

    res = (x, lns, lnb, wqkv, bqkv, wout, bout)
    ref = fta._bwd_ln(t, heads, res, g)
    with pltpu.force_tpu_interpret_mode():
        got = fta._bwd_ln_pallas(t, heads, res, g)
    names = ("dx", "dgamma", "dbeta", "dwqkv", "dbqkv", "dwout", "dbout")
    for name, r, o in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=3e-4, atol=3e-4, err_msg=name)


def test_pallas_temporal_ln_backward_grad_check():
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    t, heads, n, d = 4, 2, 16, 32
    x = _rand((2 * t, n, d), 0)
    lns = jnp.ones((d,))
    lnb = jnp.zeros((d,))
    wqkv = _rand((d, 3 * d), 3) * 0.2
    bqkv = jnp.zeros((3 * d,))
    wout = _rand((d, d), 5) * 0.2
    bout = jnp.zeros((d,))

    def loss_ref(x):
        return jnp.sum(fta._ref_ln_impl(x, lns, lnb, wqkv, bqkv, wout,
                                        bout, t, heads) ** 2)

    def loss_kernel(x):
        return jnp.sum(fta.fused_ln_temporal_block(
            x, lns, lnb, wqkv, bqkv, wout, bout, t, heads) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(x)
    with pltpu.force_tpu_interpret_mode():
        g_kernel = jax.jit(jax.grad(loss_kernel))(x)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_pallas_plain_attention_backward_matches_xla_vjp():
    """No-LN backward (fused_attention_block) vs the XLA-remat cotangents."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _bwd, _bwd_pallas,
    )
    heads, l, d = 2, 37, 64
    x = _rand((B, l, d), 0)
    wqkv = _rand((d, 3 * d), 3) * 0.1
    bqkv = 0.1 * _rand((3 * d,), 4)
    wout = _rand((d, d), 5) * 0.1
    bout = 0.1 * _rand((d,), 6)
    g = _rand((B, l, d), 7)
    res = (x, wqkv, bqkv, wout, bout)
    ref = _bwd(heads, l, res, g)
    with pltpu.force_tpu_interpret_mode():
        got = _bwd_pallas(heads, l, res, g)
    for name, r, o in zip(("dx", "dwqkv", "dbqkv", "dwout", "dbout"),
                          ref, got):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_plain_temporal_backward_matches_xla_vjp():
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    t, heads, n, d = 4, 2, 37, 64
    b = 3
    x = _rand((b * t, n, d), 0)
    wqkv = _rand((d, 3 * d), 3) * 0.1
    bqkv = 0.1 * _rand((3 * d,), 4)
    wout = _rand((d, d), 5) * 0.1
    bout = 0.1 * _rand((d,), 6)
    g = _rand((b * t, n, d), 7)
    res = (x, wqkv, bqkv, wout, bout)
    ref = fta._bwd(t, heads, res, g)
    with pltpu.force_tpu_interpret_mode():
        got = fta._bwd_plain_pallas(t, heads, res, g)
    for name, r, o in zip(("dx", "dwqkv", "dbqkv", "dwout", "dbout"),
                          ref, got):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=3e-4, atol=3e-4, err_msg=name)


def test_pallas_temporal_segment_backward_matches_xla_vjp(monkeypatch):
    """Segment-core temporal backward (T > LONG_CLIP_T) vs XLA-remat
    cotangents. Cutover lowered so the segment core runs at a small traced
    size (interpret mode unrolls the grid; t=20 traces for ~55 s)."""
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta
    monkeypatch.setattr(fta, "LONG_CLIP_T", 4)
    t, heads, n, d = 6, 2, 9, 64  # t > LONG_CLIP_T forces the segment core
    b = 1
    x = _rand((b * t, n, d), 0)
    lns = 1.0 + 0.1 * _rand((d,), 1)
    lnb = 0.1 * _rand((d,), 2)
    wqkv = _rand((d, 3 * d), 3) * 0.1
    bqkv = 0.1 * _rand((3 * d,), 4)
    wout = _rand((d, d), 5) * 0.1
    bout = 0.1 * _rand((d,), 6)
    g = _rand((b * t, n, d), 7)
    res = (x, lns, lnb, wqkv, bqkv, wout, bout)
    ref = fta._bwd_ln(t, heads, res, g)
    with pltpu.force_tpu_interpret_mode():
        got = fta._bwd_ln_pallas_segment(t, heads, res, g)
    names = ("dx", "dgamma", "dbeta", "dwqkv", "dbqkv", "dwout", "dbout")
    for name, r, o in zip(names, ref, got):
        # the segment core rounds per-pair products to bf16 before the
        # head sum (same property as its forward, tested at 2e-2): ~0.2%
        scale = max(float(np.abs(np.asarray(r)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(o, np.float32) / scale,
            np.asarray(r, np.float32) / scale,
            atol=5e-3, err_msg=name)


def test_bwd_dispatch_selects_pallas_at_flagship_widths():
    """Regression: the VMEM estimate must admit the widths the kernels were
    built for (ViT-B 197/768) and reject ViT-L (272/1024)."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import _bwd_vmem_fits
    assert _bwd_vmem_fits(197, 768)     # ViT-B spatial
    assert _bwd_vmem_fits(208, 768)     # padded-through variant
    assert not _bwd_vmem_fits(257, 1024)  # ViT-L -> XLA-remat fallback


def test_kernel_layernorm_mxu_mode_matches_vpu():
    """AIM_KERNEL_LN=mxu (ones-matmul moment reductions, the knockout
    sweep's 'fastln' candidate) computes the same LN as the default VPU
    reduction to fp32 roundoff."""
    import numpy as np
    from adapt_image_models_tpu.ops import fused_qkv_attention as fqa

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 768)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(768,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(768,)), jnp.float32)

    class _Ref:
        def __init__(self, v):
            self.v = v
        def __getitem__(self, _):
            return self.v

    old = fqa._LN_MODE
    try:
        fqa._LN_MODE = "vpu"
        ref = fqa._kernel_layernorm(x, _Ref(scale), _Ref(bias), jnp.float32)
        fqa._LN_MODE = "mxu"
        got = fqa._kernel_layernorm(x, _Ref(scale), _Ref(bias), jnp.float32)
    finally:
        fqa._LN_MODE = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_eval_softmax_t_mode_matches_stacked():
    """AIM_EVAL_SOFTMAX=t (transposed scores, sublane reductions — the
    knockout 'softmax_t' candidate) matches the stacked default through
    the public fused op, including padded-token masking (L=197 pads to
    a lane multiple inside the kernel)."""
    import numpy as np
    from adapt_image_models_tpu.ops import fused_qkv_attention as fqa

    x = _rand((2, 197, D), 10)
    wqkv = _rand((D, 3 * D), 11) * 0.05
    bqkv = _rand((3 * D,), 12) * 0.05
    wout = _rand((D, D), 13) * 0.05
    bout = _rand((D,), 14) * 0.05
    old = fqa._SOFTMAX_MODE
    try:
        fqa._SOFTMAX_MODE = "stacked"
        with pltpu.force_tpu_interpret_mode():
            ref = fused_qkv_attention(x, wqkv, bqkv, wout, bout, H)
        fqa._SOFTMAX_MODE = "t"
        with pltpu.force_tpu_interpret_mode():
            got = fused_qkv_attention(x, wqkv, bqkv, wout, bout, H)
    finally:
        fqa._SOFTMAX_MODE = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_temporal_ln_block_backward_dispatch_t32(monkeypatch):
    """T=32 at production widths must NOT route to the 5-output segment
    backward kernel (measured 19.12M > 16M VMEM on-chip): the dispatch
    falls back to the exact XLA-remat backward, and gradients still flow."""
    import numpy as np
    from adapt_image_models_tpu.ops import fused_temporal_attention as fta

    assert not fta._seg_bwd_vmem_fits(32, 8, 768)
    assert not fta._seg_bwd_vmem_fits(32, 8, 1024)
    assert fta._seg_bwd_vmem_fits(32, 8, 64)  # test dims keep the kernel

    # gradient flows through the XLA fallback branch: force the fits
    # predicate False at tiny dims (the branch itself is width-agnostic).
    # Cutover lowered so the segment route engages at a small traced size —
    # interpret mode unrolls the grid, t=20 costs ~15 s vs ~4 s at t=6.
    monkeypatch.setattr(fta, "LONG_CLIP_T", 4)
    d, t = 64, 6  # t > full-core threshold -> segment route
    x = _rand((t, 8, d), 0) * 0.1
    lns = jnp.ones((d,))
    lnb = jnp.zeros((d,))
    wqkv = _rand((d, 3 * d), 1) * 0.02
    bqkv = jnp.zeros((3 * d,))
    wout = _rand((d, d), 2) * 0.02
    bout = jnp.zeros((d,))

    def f(xx):
        return fta.fused_ln_temporal_block(xx, lns, lnb, wqkv, bqkv, wout,
                                           bout, t, 4).sum()

    old = fta._seg_bwd_vmem_fits
    try:
        fta._seg_bwd_vmem_fits = lambda *a: False
        with pltpu.force_tpu_interpret_mode():
            gx = jax.grad(f)(x)
    finally:
        fta._seg_bwd_vmem_fits = old
    assert np.isfinite(np.asarray(gx)).all()
    # (segment-kernel gradient parity itself is covered by
    # test_pallas_temporal_segment_backward_matches_xla_vjp)
