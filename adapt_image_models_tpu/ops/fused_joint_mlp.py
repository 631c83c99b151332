"""Fused AIM joint adaptation: fp32 LayerNorm -> CLIP MLP (QuickGELU) +
scaled MLP_Adapter -> residual add, in ONE Pallas kernel.

The joint step ``x + mlp(ln_2(x)) + scale * MLP_Adapter(ln_2(x))``
(reference ``vitclip_aim.py:211``) is the last XLA-side HBM hog after the
attention kernels were fused (profiled r2, ViT-B b32): the ln_2
mean/var reduction (~4.6 ms), the (BT, N, 4D) MLP hidden round-trip
(~9 ms) and the separate adapter + residual passes (~9 ms). This kernel
reads x once per row tile and writes the final residual sum once.

Layout: x stays in the residual stream's native (B*T, N, D) layout — one
sample's N tokens per grid cell, so no HBM reshape separates this kernel
from the attention kernels. Grid (B*T, n_chunks): the hidden dimension is
chunked so ViT-L's 16.8 MB of MLP weights stream through VMEM; a fp32
scratch accumulates across chunks (grid iterates chunks innermost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adapt_image_models_tpu.ops.fused_qkv_attention import (
    _kernel_layernorm, _round_up,
)


def _kernel(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref,
            *, scale: float, n_chunks: int):
    j = pl.program_id(1)
    x = x_ref[0]  # (N, D)
    xn = _kernel_layernorm(x, lns_ref, lnb_ref, x.dtype)

    @pl.when(j == 0)
    def _():
        # residual + adapter branch (adapter weights are tiny, done once);
        # tanh-gelu: exact erf does not lower in Mosaic (~5e-4 deviation,
        # below bf16 resolution)
        a = jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
        a = jax.nn.gelu(a + b1_ref[...].astype(jnp.float32), approximate=True)
        z = jnp.dot(a.astype(x.dtype), w2_ref[...],
                    preferred_element_type=jnp.float32)
        z = z + b2_ref[...].astype(jnp.float32)
        acc_ref[...] = (x.astype(jnp.float32) + scale * z
                        + bproj_ref[...].astype(jnp.float32))

    h = jnp.dot(xn, wfc_ref[...], preferred_element_type=jnp.float32)
    h = h + bfc_ref[...].astype(jnp.float32)
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU, fp32
    acc_ref[...] += jnp.dot(h.astype(x.dtype), wproj_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def fused_joint_mlp_adapter(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                            w1, b1, w2, b2, scale: float,
                            tile_m: int = 0) -> jax.Array:  # tile_m unused (one sample per cell)
    # PERF LEAD (unmeasured — relay compile service was down when tried):
    # one sample per cell means M=197 matmuls, which under-fills the MXU
    # (microbench: this kernel runs ~114 TFLOP/s vs ~186 for the XLA
    # full-batch MLP). Packing 2-4 samples per cell (block (R, l, d),
    # reshape to (R*l, d)) with the hidden chunked to keep the fp32
    # transient under ~5 MB should close part of that gap; heuristic:
    # trade n_chunks x2 for rows x2 while rows < 4.
    """x: (B, L, D) raw residual stream ->
    ``x + mlp(LN(x)) + scale * adapter(LN(x))`` (adapter without skip)."""
    b, l, d = x.shape
    d4 = w_fc.shape[1]
    dh = w1.shape[1]
    # chunk the hidden dim so the streamed MLP weights stay under ~10 MB
    n_chunks = 1
    while 2 * d * (d4 // n_chunks) * 2 > 10 * 2 ** 20:
        n_chunks *= 2
    hc = d4 // n_chunks

    kernel = functools.partial(_kernel, scale=float(scale), n_chunks=n_chunks)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc,), lambda i, j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((l, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * d * (8 * d + dh * 2 // 1),
            bytes_accessed=2 * (2 * b * l * d * 2 + 8 * d * d + 2 * d * dh),
            transcendentals=b * l * (d4 + dh),
        ),
    )(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, w1, b1, w2, b2)
    return out


def _ref_impl(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
              w1, b1, w2, b2, scale):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xn = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h = xn @ w_fc.astype(x.dtype) + b_fc.astype(x.dtype)
    h32 = h.astype(jnp.float32)
    h = (h32 * jax.nn.sigmoid(1.702 * h32)).astype(x.dtype)
    mlp = h @ w_proj.astype(x.dtype) + b_proj.astype(x.dtype)
    a = jax.nn.gelu(xn.astype(jnp.float32) @ w1.astype(jnp.float32)
                    + b1.astype(jnp.float32), approximate=False)
    z = a @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    return (x.astype(jnp.float32) + mlp.astype(jnp.float32)
            + scale * z).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def fused_joint_block(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                      w1, b1, w2, b2, scale):
    return fused_joint_mlp_adapter(x, ln_scale, ln_bias, w_fc, b_fc,
                                   w_proj, b_proj, w1, b1, w2, b2, scale)


def _fwd(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, w1, b1, w2, b2,
         scale):
    y = fused_joint_mlp_adapter(x, ln_scale, ln_bias, w_fc, b_fc, w_proj,
                                b_proj, w1, b1, w2, b2, scale)
    return y, (x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
               w1, b1, w2, b2)


def _bwd(scale, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_impl(*a, scale), *res)
    return vjp(g.astype(jnp.float32).astype(g.dtype))


fused_joint_block.defvjp(_fwd, _bwd)
