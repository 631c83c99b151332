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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adapt_image_models_tpu.ops.fused_qkv_attention import (
    _cparams, _kernel_layernorm, _round_up,
)

# Partial-row-tile hardening (round 5). The batch-4 fused train step
# reproducibly KILLED the v5e TPU worker ("kernel fault") while every op
# passed isolated; the on-chip bisect (PARITY.md round 5) pinned it to
# this file's rows kernels when the flattened row count leaves a partial
# last tile (micro-batch 4 x 8 frames: 6304 rows = 49x128 + 32) inside
# the full train program — `joint_core='xla'` or padding the rows to a
# tile multiple both run clean, everything else unchanged crashes. Row
# padding is therefore ON by default: one extra 128-row tile of work and
# a pad/slice copy pair ONLY when rows % 128 != 0 (the common batch-32
# geometry divides evenly and pays nothing). AIM_JOINT_PAD_ROWS=0
# restores the unpadded layout for A/B; AIM_JOINT_ARB=1 stages the
# 'arbitrary' grid-semantics variant (measured irrelevant to the fault).
_PAD_ROWS = bool(int(os.environ.get("AIM_JOINT_PAD_ROWS", "1")))
_JOINT_SEMANTICS = ("arbitrary" if int(os.environ.get("AIM_JOINT_ARB", "0"))
                    else "parallel")


def _maybe_pad_rows(arr2d, tm: int):
    """Pad axis 0 to a multiple of ``tm`` (returns (padded, orig_rows))."""
    rows = arr2d.shape[0]
    pad = (-rows) % tm
    if not _PAD_ROWS or pad == 0:
        return arr2d, rows
    return jnp.pad(arr2d, ((0, pad), (0, 0))), rows


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
    # Superseded by ``fused_joint_mlp_rows`` (rows-tiled, fills the MXU);
    # kept as the per-sample oracle for interpret-mode tests.
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
        compiler_params=_cparams("parallel", "arbitrary"),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * d * (8 * d + dh * 2 // 1),
            bytes_accessed=2 * (2 * b * l * d * 2 + 8 * d * d + 2 * d * dh),
            transcendentals=b * l * (d4 + dh),
        ),
    )(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, w1, b1, w2, b2)
    return out


# ---------------------------------------------------------------------------
# Rows-tiled kernel (the round-3 multi-row upgrade).
#
# The per-sample kernel above runs M=197-row matmuls that under-fill the MXU
# (measured ~114 TFLOP/s vs ~186 for the XLA full-batch MLP). This variant
# flattens (B, L, D) -> (B*L, D) — LN/MLP/adapter are all row-local, so
# sample boundaries are irrelevant — and tiles rows at ``TM`` per grid cell.
#
# Weight residency: hidden-chunked grids (grid (rows, chunks)) re-fetch every
# weight chunk once per row tile — O(n_tiles x W) HBM traffic. Instead the
# hidden dim is split across SEQUENTIAL ``pallas_call``s, each with its split
# of Wfc/Wproj resident via constant index maps (fetched exactly once).
# ViT-B (9.4 MB) runs as one call; ViT-L (16.8 MB) as two, chained through a
# fp32 partial-sum carry so accumulation stays fp32 end-to-end.
#
# ``gate``: optional per-row multiplier on the adapter branch — the
# drop-path gate (0 or 1/keep per sample, expanded to rows), which lets the
# TRAIN path use this kernel too (reference ``vitclip_aim.py:211``).


def _kernel_rows(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref, wproj_ref,
                 bproj_ref, w1_ref, b1_ref, w2_ref, b2_ref, gate_ref,
                 carry_ref, o_ref, *, scale: float, first: bool, last: bool,
                 has_gate: bool):
    x = x_ref[...]  # (TM, D)
    xn = _kernel_layernorm(x, lns_ref, lnb_ref, x.dtype)

    if first:
        # residual + gated adapter branch + proj bias (done once)
        a = jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
        a = jax.nn.gelu(a + b1_ref[...].astype(jnp.float32), approximate=True)
        z = jnp.dot(a.astype(x.dtype), w2_ref[...],
                    preferred_element_type=jnp.float32)
        z = z + b2_ref[...].astype(jnp.float32)
        if has_gate:
            z = z * gate_ref[...].astype(jnp.float32)
        acc = (x.astype(jnp.float32) + scale * z
               + bproj_ref[...].astype(jnp.float32))
    else:
        acc = carry_ref[...]

    h = jnp.dot(xn, wfc_ref[...], preferred_element_type=jnp.float32)
    h = h + bfc_ref[...].astype(jnp.float32)
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU, fp32
    acc = acc + jnp.dot(h.astype(x.dtype), wproj_ref[...],
                        preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)  # fp32 carry between splits


def _pick_splits(d: int, d4: int, itemsize: int = 2,
                 budget: int = 9 * 2 ** 20 + 2 ** 19) -> int:
    """Fewest sequential calls whose resident Wfc+Wproj split fits VMEM."""
    n = 1
    while 2 * d * (d4 // n) * itemsize > budget:
        n *= 2
    return n


def fused_joint_mlp_rows(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                         w1, b1, w2, b2, scale: float,
                         gate=None, tile_rows: int = 128,
                         n_splits: int = 0) -> jax.Array:
    """x: (B, L, D) raw residual stream ->
    ``x + mlp(LN(x)) + gate * scale * adapter(LN(x))``.

    ``gate``: optional (B*L,) or (B, L) per-row multiplier for the adapter
    branch (drop-path); ``None`` = 1.
    """
    b, l, d = x.shape
    rows = b * l
    d4 = w_fc.shape[1]
    dh = w1.shape[1]
    if n_splits <= 0:
        n_splits = _pick_splits(d, d4, jnp.dtype(w_fc.dtype).itemsize)
    hs = d4 // n_splits
    tm = min(tile_rows, _round_up(rows, 16))

    xr, _ = _maybe_pad_rows(x.reshape(rows, d), tm)
    has_gate = gate is not None
    gate_r = (_maybe_pad_rows(
        gate.reshape(rows, 1).astype(jnp.float32), tm)[0] if has_gate
        else jnp.zeros((1, 1), jnp.float32))
    rows_k = xr.shape[0]  # kernel-visible rows (padded when AIM_JOINT_PAD_ROWS)

    n_tiles = -(-rows_k // tm)
    row_spec = lambda w: pl.BlockSpec((tm, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    vec = lambda w: pl.BlockSpec((w,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    gate_spec = (row_spec(1) if has_gate
                 else pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM))

    carry = jnp.zeros((1, 1), jnp.float32)  # dummy for the first call
    for s in range(n_splits):
        first = s == 0
        last = s == n_splits - 1
        kernel = functools.partial(_kernel_rows, scale=float(scale),
                                   first=first, last=last,
                                   has_gate=has_gate)
        carry_spec = (row_spec(d) if not first
                      else pl.BlockSpec((1, 1), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        out_dtype = x.dtype if last else jnp.float32
        flops_s = 2 * rows * d * (2 * hs + (2 * dh if first else 0))
        carry = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows_k, d), out_dtype),
            grid=(n_tiles,),
            in_specs=[
                row_spec(d), vec(d), vec(d),
                mat(d, hs), vec(hs), mat(hs, d), vec(d),
                mat(d, dh), vec(dh), mat(dh, d), vec(d),
                gate_spec, carry_spec,
            ],
            out_specs=row_spec(d),
            compiler_params=_cparams(_JOINT_SEMANTICS),
            cost_estimate=pl.CostEstimate(
                flops=flops_s,
                bytes_accessed=2 * rows * d * (2 if last and first else 6)
                + 2 * d * hs * 2,
                transcendentals=rows * (hs + (dh if first else 0)),
            ),
        )(xr, ln_scale, ln_bias,
          w_fc[:, s * hs:(s + 1) * hs], b_fc[s * hs:(s + 1) * hs],
          w_proj[s * hs:(s + 1) * hs], b_proj,
          w1, b1, w2, b2, gate_r, carry)
    if rows_k != rows:
        carry = carry[:rows]
    return carry.reshape(b, l, d)


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
    return vjp(g)


fused_joint_block.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Rows-tiled BACKWARD kernel (round 3 — the train-memory/throughput fix).
#
# The XLA backward of the joint step saves the (B*L, 4D) MLP hidden per
# layer across the scan (3 x 3.46 GB at ViT-B batch 32 — the dominant OOM
# source, measured r3) and runs at remat speed. This kernel recomputes
# LN -> hidden in VMEM and emits only dX; the custom VJP saves just
# (x, weights, gate).
#
# Split of labor (mirrors the attention backward kernels):
#   kernel : dxn_mlp = (g Wproj^T * qgelu'(xn Wfc + b)) Wfc^T  [hot matmuls]
#            + LN backward + residual add -> dX
#   XLA    : adapter backward (tiny matmuls; EXACT dW1/db1/dW2/db2 since
#            adapters are the trainable unit), dgate, and the carry init
#            dxn_adapter fed into the kernel's fp32 accumulator.
#   frozen : Wfc/bfc/Wproj/bproj/ln_2 cotangents are returned as ZEROS —
#            valid for the AIM regime where the CLIP MLP + ln_2 are frozen
#            (reference vitclip_aim.py:424-427). apis/train refuses the
#            fused train path if those weights are in the trainable tree.


def _qgelu_grad(h):
    s = jax.nn.sigmoid(1.702 * h)
    return s + 1.702 * h * s * (1.0 - s)


def _kernel_rows_bwd(x_ref, g_ref, carry_ref, wfc_ref, bfc_ref, wproj_ref,
                     lns_ref, lnb_ref, gate_ref, w1_ref, b1_ref, w2_ref,
                     o_ref, xn_ref, dpre_ref, a_ref,
                     *, last: bool, inner: int, first: bool,
                     has_gate: bool, scale: float):
    x = x_ref[...]                       # (TM, D) stream dtype
    g = g_ref[...]                       # (TM, D) stream dtype
    dt = x.dtype

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mean) * rstd
    lns = lns_ref[...].astype(jnp.float32)
    xn = (xhat * lns + lnb_ref[...].astype(jnp.float32)).astype(dt)
    if first:
        # adapter backward in-kernel (first split only): exact dpre/a out,
        # dxn_adapter folded straight into the accumulator — no fp32
        # (rows, D) carry round-trips through HBM
        from adapt_image_models_tpu.ops.fused_qkv_attention import (
            _tanh_gelu_grad,
        )
        pre = jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
        pre = pre + b1_ref[...].astype(jnp.float32)
        a = jax.nn.gelu(pre, approximate=True)
        dz = g.astype(jnp.float32) * scale
        if has_gate:
            dz = dz * gate_ref[...].astype(jnp.float32)
        da = jax.lax.dot_general(dz.astype(dt), w2_ref[...],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpre = da * _tanh_gelu_grad(pre)
        acc = jax.lax.dot_general(dpre.astype(dt), w1_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        xn_ref[...] = xn.astype(xn_ref.dtype)
        dpre_ref[...] = dpre.astype(dpre_ref.dtype)
        a_ref[...] = a.astype(a_ref.dtype)
    else:
        acc = carry_ref[...]             # (TM, D) fp32
        xn_ref[...] = jnp.zeros_like(xn_ref[...])
        dpre_ref[...] = jnp.zeros_like(dpre_ref[...])
        a_ref[...] = jnp.zeros_like(a_ref[...])

    hs = wfc_ref.shape[1]
    step = hs // inner
    for i in range(inner):
        w_c = wfc_ref[:, i * step:(i + 1) * step]
        b_c = bfc_ref[i * step:(i + 1) * step]
        p_c = wproj_ref[i * step:(i + 1) * step, :]
        h = jnp.dot(xn, w_c, preferred_element_type=jnp.float32)
        h = h + b_c.astype(jnp.float32)
        dact = jax.lax.dot_general(g, p_c, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dh = (dact * _qgelu_grad(h)).astype(dt)
        acc = acc + jax.lax.dot_general(
            dh, w_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    if last:
        dxhat = acc * lns
        mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
        mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = rstd * (dxhat - mdx - xhat * mdxx) + g.astype(jnp.float32)
        o_ref[...] = dx.astype(o_ref.dtype)
    else:
        o_ref[...] = acc


def fused_joint_mlp_rows_bwd(x, g, gate, ln_scale, ln_bias, w_fc, b_fc,
                             w_proj, w1, b1, w2, scale: float,
                             tile_rows: int = 128, n_splits: int = 0):
    """Whole joint-step backward: dX (MLP + in-kernel adapter dxn + LN
    backward + residual) plus (xn, dpre, a) for XLA's exact adapter dW.

    x: (B, L, D) raw residual input; g: cotangent at the op output;
    gate: (B*L,) per-row drop-path gate or None.
    Returns (dx (B, L, D), xn, dpre, a).
    """
    b, l, d = x.shape
    rows = b * l
    d4 = w_fc.shape[1]
    dh = w1.shape[1]
    if n_splits <= 0:
        n_splits = _pick_splits(d, d4, jnp.dtype(w_fc.dtype).itemsize)
    hs = d4 // n_splits
    tm = min(tile_rows, _round_up(rows, 16))
    inner = 2 if hs * d * 2 > 5 * 2 ** 20 else 1
    has_gate = gate is not None

    xr, _ = _maybe_pad_rows(x.reshape(rows, d), tm)
    gr, _ = _maybe_pad_rows(g.reshape(rows, d), tm)
    gate_r = (_maybe_pad_rows(
        gate.reshape(rows, 1).astype(jnp.float32), tm)[0] if has_gate
        else jnp.zeros((1, 1), jnp.float32))
    rows_k = xr.shape[0]
    n_tiles = -(-rows_k // tm)
    row_spec = lambda w: pl.BlockSpec((tm, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    dummy = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = lambda w: pl.BlockSpec((w,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)

    carry = jnp.zeros((1, 1), jnp.float32)
    xn = dpre = a = None
    for s in range(n_splits):
        first = s == 0
        last = s == n_splits - 1
        kernel = functools.partial(_kernel_rows_bwd, last=last, inner=inner,
                                   first=first, has_gate=has_gate,
                                   scale=float(scale))
        out_dtype = x.dtype if last else jnp.float32
        out_shape = [jax.ShapeDtypeStruct((rows_k, d), out_dtype)]
        out_specs = [row_spec(d)]
        if first:
            out_shape += [jax.ShapeDtypeStruct((rows_k, d), x.dtype),
                          jax.ShapeDtypeStruct((rows_k, dh), x.dtype),
                          jax.ShapeDtypeStruct((rows_k, dh), x.dtype)]
            out_specs += [row_spec(d), row_spec(dh), row_spec(dh)]
        else:
            out_shape += [jax.ShapeDtypeStruct((1, 1), x.dtype)] * 3
            out_specs += [dummy] * 3
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            grid=(n_tiles,),
            in_specs=[
                row_spec(d), row_spec(d),
                row_spec(d) if not first else dummy,
                mat(d, hs), vec(hs), mat(hs, d),
                vec(d), vec(d),
                row_spec(1) if has_gate else dummy,
                mat(d, dh), vec(dh), mat(dh, d),
            ],
            out_specs=tuple(out_specs),
            compiler_params=_cparams(_JOINT_SEMANTICS),
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * d * 3 * hs,
                bytes_accessed=2 * rows * d * 10 + 2 * d * hs * 2,
                transcendentals=rows * hs,
            ),
        )(xr, gr, carry if not first else jnp.zeros((1, 1), jnp.float32),
          w_fc[:, s * hs:(s + 1) * hs], b_fc[s * hs:(s + 1) * hs],
          w_proj[s * hs:(s + 1) * hs], ln_scale, ln_bias,
          gate_r, w1, b1, w2)
        carry = outs[0]
        if first:
            xn, dpre, a = outs[1], outs[2], outs[3]
    if rows_k != rows:
        carry, xn, dpre, a = (t[:rows] for t in (carry, xn, dpre, a))
    return carry.reshape(b, l, d), xn, dpre, a


def _ref_train_impl(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                    w1, b1, w2, b2, gate, scale):
    """XLA oracle for the gated train op (gate: (B*L,) rows)."""
    b, l, d = x.shape
    g3 = gate.reshape(b, l, 1)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xn32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    xn32 = xn32 * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    xn = xn32.astype(x.dtype)
    h = xn @ w_fc.astype(x.dtype) + b_fc.astype(x.dtype)
    h32 = h.astype(jnp.float32)
    h = (h32 * jax.nn.sigmoid(1.702 * h32)).astype(x.dtype)
    mlp = h @ w_proj.astype(x.dtype) + b_proj.astype(x.dtype)
    a = jax.nn.gelu(xn32 @ w1.astype(jnp.float32) + b1.astype(jnp.float32),
                    approximate=True)
    z = a @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    return (x32 + mlp.astype(jnp.float32) + g3 * scale * z).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def fused_joint_train_block(x, ln_scale, ln_bias, w_fc, b_fc, w_proj,
                            b_proj, w1, b1, w2, b2, gate, scale):
    """Train-mode joint adaptation with a per-row drop-path gate:
    ``x + mlp(LN(x)) + gate * scale * adapter(LN(x))``.

    Forward = rows kernel; backward = rows backward kernel for the hot
    MLP/LN path + exact XLA adapter cotangents. Cotangents for the frozen
    CLIP MLP and ln_2 are ZEROS (AIM freeze regime, vitclip_aim.py:424-427)
    — apis/train guards that those params are not trainable when this op is
    active."""
    return fused_joint_mlp_rows(x, ln_scale, ln_bias, w_fc, b_fc, w_proj,
                                b_proj, w1, b1, w2, b2, scale, gate=gate)


def _train_fwd(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, w1, b1,
               w2, b2, gate, scale):
    y = fused_joint_mlp_rows(x, ln_scale, ln_bias, w_fc, b_fc, w_proj,
                             b_proj, w1, b1, w2, b2, scale, gate=gate)
    return y, (x, ln_scale, ln_bias, w_fc, b_fc, w_proj, w1, b1, w2, b2,
               gate)


def _train_bwd(scale, res, g):
    x, ln_scale, ln_bias, w_fc, b_fc, w_proj, w1, b1, w2, b2, gate = res
    b, l, d = x.shape
    rows = b * l
    dt = x.dtype
    g32 = g.astype(jnp.float32)

    # whole backward in the kernel: dX (MLP + adapter-dxn + LN + residual)
    # with (xn, dpre, a) emitted so XLA's adapter dW is pure einsums
    dx, xn, dpre, a = fused_joint_mlp_rows_bwd(
        x, g, gate, ln_scale, ln_bias, w_fc, b_fc, w_proj,
        w1, b1, w2, scale)
    dz = (gate.reshape(b, l, 1).astype(jnp.float32) * scale * g32)
    xn3 = xn.reshape(b, l, d)
    dpre3 = dpre.reshape(b, l, -1)
    a3 = a.reshape(b, l, -1)
    dw1 = jnp.einsum("bld,blh->dh", xn3.astype(jnp.float32),
                     dpre3.astype(jnp.float32)).astype(w1.dtype)
    db1 = jnp.sum(dpre3.astype(jnp.float32), axis=(0, 1)).astype(b1.dtype)
    dw2 = jnp.einsum("blh,bld->hd", a3.astype(jnp.float32),
                     dz).astype(w2.dtype)
    db2 = jnp.sum(dz, axis=(0, 1)).astype(b2.dtype)
    z = (a3.astype(jnp.float32) @ w2.astype(jnp.float32)
         + b2.astype(jnp.float32))
    dgate = (scale * jnp.sum(g32 * z, axis=-1)).reshape(rows)
    dgate = dgate.astype(gate.dtype)

    zeros = lambda t: jnp.zeros_like(t)
    return (dx, zeros(ln_scale), zeros(ln_bias), zeros(w_fc), zeros(b_fc),
            zeros(w_proj), jnp.zeros((d,), dt), dw1, db1, dw2, db2, dgate)


fused_joint_train_block.defvjp(_train_fwd, _train_bwd)
