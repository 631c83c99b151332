"""Fused temporal-attention branch: (optional fp32 LayerNorm) -> QKV
projection -> frame-axis attention -> output projection, one Pallas kernel.

AIM's temporal attention runs over T=8..32 frames per patch position
(``vitclip_aim.py:200``) — thousands of (T x hd) x (hd x T) matmuls that
strand the MXU and, in XLA, cost ~6.5 ms/layer of mostly HBM traffic at
ViT-B batch-32 shapes. This kernel reads x/q/k/v once per (batch, token
tile) cell and computes the tiny frame-axis attention entirely in VMEM:

* per (tq, tk) frame pair the head logits come from one VPU multiply plus a
  (tile, D) @ (D, H) SEGMENT-SUM matmul (a constant 0/1 matrix that sums
  each head's 64 lanes) — MXU-shaped instead of 75k tiny GEMMs;
* probabilities broadcast back to lanes with the transposed segment matrix;
* the projections are ordinary large matmuls on the (T*tile, D) block.

Layout contract: x stays in the residual stream's native (B*T, N, D)
layout — the T rows of one video are contiguous along axis 0, so the block
is simply (T, TILE, D) at row offset i*T; grid is (B, cdiv(N, TILE)) and
the last block is partial (masked read/write). No 4D reshape, no pad/slice
ever hits HBM (round-2 upgrade; r1 padded N to a tile multiple in HBM).
Temporal attention is independent per token position, so the partial
block's out-of-range rows only ever mix with themselves. The fp32 LN
prologue optionally fuses in (``fused_ln_temporal_attention``).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adapt_image_models_tpu.ops.fused_qkv_attention import (
    _cparams, _smem_gate,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _split_frames(bt: int, t: int) -> int:
    """Rows-per-frame-group count; a non-divisible frame axis would silently
    drop the trailing bt % t rows from the kernel output."""
    if bt % t:
        raise ValueError(f"leading axis {bt} is not divisible by "
                         f"num_frames={t}")
    return bt // t


# Frame-axis cutover: the masked-full core covers T <= LONG_CLIP_T; longer
# clips take the segment core. Module-level so tests can monkeypatch it and
# exercise the long-clip paths at small traced sizes (interpret mode unrolls
# the grid into the jaxpr — T=32 traces for ~40 s).
#
# Round 4: raised 16 -> 32. The segment core's per-(tq, tk) pairs are 1024
# MXU-starved (tile, D) @ (D, H) matmuls at T=32 — measured 1134 us/clip/
# layer on v5e ViT-B 32f vs the grouped masked-full core's 434 us at
# tile=16 (2.6x; same 3.9e-3 max err vs the fp32 reference impl). The
# full-core row cap at T > 16 is 512 (tile 16): the 768-row tile-24 cell
# is a compile-time VMEM OOM (see _auto_tile).
LONG_CLIP_T = int(os.environ.get("AIM_LONG_CLIP_T", "32"))

# 5-output backward cells (dx, dqkv, dy, y, o) exceed the VMEM scope past
# T=16 (measured 19.12M at T=32/tile=8); only the dX-only backward cells
# fit at T=32. Gates _bwd_ln_dispatch/_bwd_plain_dispatch independently of
# the forward-core choice.
FULL_BWD_MAX_T = int(os.environ.get("AIM_FULL_BWD_MAX_T", "16"))

# Eval stacked-softmax head-chunk width for the masked-full core: heads per
# stacked score block (default: all heads of a CLIP ViT in one chunk —
# the round-3 measured layout). Smaller chunks let Mosaic overlap the next
# chunk's MXU score matmuls with the current chunk's VPU softmax; staged as
# an env A/B like AIM_KERNEL_LN / AIM_EVAL_SOFTMAX (read at import).
# MEASURED r4 (v5e batch-512 full model, sweep_softmax_layout.py): 6/4/2-
# head chunks all LOSE (352.4/350.3/352.0 vs 355.1 baseline) — unlike the
# spatial cells, where 6-head chunks win (~+2 clips/s, now the default
# there); the temporal groups' (128, 128) score blocks are already small
# enough that chunking only adds loop overhead. Default stays all-heads.
_TSTACK_HEADS = int(os.environ.get("AIM_TSTACK_HEADS", "16"))

# Eval wide-tile knobs (see _auto_tile): the T>16 row cap and the width
# gate were calibrated against Mosaic's old 16M scoped-vmem assert — with
# the round-4 raised limit (fused_qkv_attention._VMEM_LIMIT) larger cells
# compile, so both are env-tunable for on-chip A/B before flipping.
_LONG_WIDE_CAP = int(os.environ.get("AIM_LONG_WIDE_CAP", "512"))
_WIDE_MAX_D = int(os.environ.get("AIM_WIDE_MAX_D", "768"))

# Separate gate for the whole-step TRAIN backward cell
# (fused_temporal_step_bwd_dx): that cell carries adapter/gate transients on
# top of the core backward and measured 17.7M VMEM at T=32/tile=8 — beyond
# it the backward takes the two-kernel composition regardless of which CORE
# the forward kernels use. Independent of LONG_CLIP_T so the core choice
# and the cell-fits question can be measured/flipped separately.
STEP_BWD_MAX_T = int(os.environ.get("AIM_STEP_BWD_MAX_T", "16"))

# Width gate for the same cell: at d=1024 (ViT-L) the whole-step backward
# needs 21-23M scoped VMEM (its 4*d^2 resident weights alone are 8.4M).
# Since round 4 the kernels raise Mosaic's scoped-vmem assert
# (fused_qkv_attention._VMEM_LIMIT), so the cell COMPILES at d=1024 — the
# gate is now a PERF choice between the one-kernel whole step and the
# emit_u two-kernel composition, env-tunable for on-chip A/B.
STEP_BWD_MAX_D = int(os.environ.get("AIM_STEP_BWD_MAX_D", "768"))


def _tstep_whole_cell_fits(t: int, d: int) -> bool:
    """True when the single-kernel whole-step temporal backward cell fits
    the 16M VMEM scope; otherwise the forward stashes u (emit_u) and the
    backward runs the two-kernel composition."""
    return t <= STEP_BWD_MAX_T and d <= STEP_BWD_MAX_D


def _use_full_core(t: int) -> bool:
    """Masked-full core beats the segment-sum core for short frame axes
    (measured v5e ViT-B b64: 6.97 vs 7.47 ms/layer); its waste factor grows
    with tile so the segment core stays the choice for long clips."""
    return t <= LONG_CLIP_T


def _sanitize_tokens(x, tile: int, tok_limit):
    """Zero rows of (T*tile, D) whose token slot >= tok_limit: a partial
    block's out-of-range reads are undefined (NaN in interpret mode) and the
    full-core score matrix would spread them into real rows via key columns."""
    rows = x.shape[0]
    tok = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % tile
    return jnp.where(tok < tok_limit, x, jnp.zeros_like(x))


def _core_group(t: int) -> int:
    """Token-group width for the masked-full core: ~128 rows per score
    matmul. The un-grouped core at tile=104/T=8 computes (832, 832) score
    matrices where only the T x T frame blocks are useful — 26% of kernel
    FLOPs wasted (measured r3: temporal fwd 85 TF/s useful vs spatial 100).
    Grouping keeps the MXU filled (t*group ~ 128 rows) at 6.5x less score
    waste."""
    return max(8, 128 // t)


def _masked_full_core(q, k, v, t: int, gw: int, heads: int, scale: float,
                      dtype, stacked: bool = True):
    """One group's attention: q/k/v (t*gw, D), row = frame*gw + token;
    token attends its own slot across frames. Returns (t*gw, D) in dtype.

    When ``stacked`` (eval kernels), the per-head softmax runs STACKED
    (all heads' (grows, grows) score matrices concatenated into one fp32
    array) so mask/max/exp/sum execute as few large VPU ops instead of
    ``heads`` small serial chains; measured v5e batch-512 full model:
    +3.7 clips/s over the per-head chains (see docs/benchmark.md r3).
    Train kernels pass ``stacked=False``: their cells carry adapter/gate
    transients and the stacked score block slows the step (see
    fused_qkv_attention._attention_body). The 1/sqrt(hd) scale folds into
    q when it is a power of two (hd=64 for all CLIP widths — exact in
    bf16)."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _is_pow2, _FAST_SOFTMAX, _LOG2E,
    )

    grows, d = q.shape
    hd = d // heads
    if not stacked:
        # train cells: EXACT original per-head chain (scale+mask fused into
        # one multiply-add, no prescaled q copy) — the restructure slows
        # the VMEM-pressure-bound whole-step train kernels (see
        # fused_qkv_attention._attention_body).
        ri = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 1)
        maskadd = jnp.where((ri % gw) == (ci % gw), jnp.float32(0.0),
                            jnp.float32(MASK_VALUE))
        outs = []
        for h in range(heads):
            qh = q[:, h * hd:(h + 1) * hd]
            kh = k[:, h * hd:(h + 1) * hd]
            vh = v[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + maskadd
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            oh = jax.lax.dot(p.astype(vh.dtype), vh,
                             preferred_element_type=jnp.float32) / denom
            outs.append(oh.astype(dtype))
        return jnp.concatenate(outs, axis=1)
    prescale = _is_pow2(scale)
    if _FAST_SOFTMAX:
        # exp2 path: fold log2(e) into the prescale (see fused_qkv_attention)
        prescale = True
        q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    elif prescale:
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    # mask add depends only on (row % gw == col % gw): within-group row
    # rr = r % grows, and since gw divides grows (grows = t*gw),
    # rr % gw == r % gw — one (grows, grows) strip serves every head
    ri = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 1)
    maskadd = jnp.where((ri % gw) == (ci % gw), jnp.float32(0.0),
                        jnp.float32(MASK_VALUE))
    # head-chunked stacking (AIM_TSTACK_HEADS, default all heads in one
    # chunk): smaller chunks let Mosaic overlap chunk i+1's MXU score
    # matmuls with chunk i's VPU softmax
    outs = []
    for h0 in range(0, heads, _TSTACK_HEADS):
        hc = min(_TSTACK_HEADS, heads - h0)
        ss = []
        for h in range(h0, h0 + hc):
            qh = q[:, h * hd:(h + 1) * hd]
            kh = k[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            ss.append(s)
        S = ss[0] if hc == 1 else jnp.concatenate(ss, axis=0)
        if not prescale:
            S = S * scale
        S = S + (maskadd if hc == 1
                 else jnp.concatenate([maskadd] * hc, axis=0))
        m = jnp.max(S, axis=1, keepdims=True)
        p = jnp.exp2(S - m) if _FAST_SOFTMAX else jnp.exp(S - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        inv = 1.0 / denom if _FAST_SOFTMAX else None
        pb = p.astype(v.dtype)
        for i, h in enumerate(range(h0, h0 + hc)):
            vh = v[:, h * hd:(h + 1) * hd]
            oh = jax.lax.dot(pb[i * grows:(i + 1) * grows], vh,
                             preferred_element_type=jnp.float32)
            oh = (oh * inv[i * grows:(i + 1) * grows] if _FAST_SOFTMAX
                  else oh / denom[i * grows:(i + 1) * grows])
            outs.append(oh.astype(dtype))
    return jnp.concatenate(outs, axis=1)


def _temporal_body_full(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                        t: int, heads: int, scale: float,
                        stacked: bool = True):
    """Full-core variant: masked (rows x rows) attention per token GROUP —
    row r = frame*group + token attends where the token slot matches. The
    projections run on the whole block (big MXU matmuls); the cores run on
    ~128-row groups (see _core_group)."""
    rows, d = x.shape
    tile = rows // t
    w = wqkv_ref[...]
    b = bqkv_ref[...]
    q = (jnp.dot(x, w[:, :d], preferred_element_type=jnp.float32)
         + b[:d].astype(jnp.float32)).astype(x.dtype)
    k = (jnp.dot(x, w[:, d:2 * d], preferred_element_type=jnp.float32)
         + b[d:2 * d].astype(jnp.float32)).astype(x.dtype)
    v = (jnp.dot(x, w[:, 2 * d:], preferred_element_type=jnp.float32)
         + b[2 * d:].astype(jnp.float32)).astype(x.dtype)
    group = _core_group(t)
    if group >= tile:
        out = _masked_full_core(q, k, v, t, tile, heads, scale, x.dtype,
                                stacked)
    else:
        q3 = q.reshape(t, tile, d)
        k3 = k.reshape(t, tile, d)
        v3 = v.reshape(t, tile, d)
        o_groups = []
        for g0 in range(0, tile, group):
            ge = min(tile, g0 + group)
            gw = ge - g0
            og = _masked_full_core(
                q3[:, g0:ge, :].reshape(t * gw, d),
                k3[:, g0:ge, :].reshape(t * gw, d),
                v3[:, g0:ge, :].reshape(t * gw, d),
                t, gw, heads, scale, x.dtype, stacked)
            o_groups.append(og.reshape(t, gw, d))
        out = jnp.concatenate(o_groups, axis=1).reshape(rows, d)
    y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
    return y + bout_ref[...].astype(jnp.float32)


def _temporal_body(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref, seg_ref,
                   t: int, heads: int, scale: float, stacked: bool = True):
    """(T*tile, D) post-LN tokens -> temporal-attention output, fp32."""
    d = x.shape[-1]
    tile = x.shape[0] // t
    if _use_full_core(t):
        return _temporal_body_full(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                                   t, heads, scale, stacked)

    from adapt_image_models_tpu.ops.fused_qkv_attention import _project_qkv
    qkv = _project_qkv(x, wqkv_ref, bqkv_ref)
    qkv = qkv.reshape(t, tile, 3 * d)
    seg = seg_ref[...]  # (D, H) 0/1 head-segment matrix, bf16

    # per (tq, tk) frame pair: one VPU multiply + one segment-sum matmul.
    # (folding the tk loop into a single (T*tile, D) matmul forces VMEM
    # relayouts across the merged dims and is 3-4x SLOWER — measured.)
    rows = []
    for tq in range(t):
        q_tq = qkv[tq, :, :d]
        pair_logits = []
        for tk in range(t):
            k_tk = qkv[tk, :, d:2 * d]
            prod = (q_tq * k_tk).astype(jnp.bfloat16)
            pair_logits.append(jnp.dot(prod, seg,
                                       preferred_element_type=jnp.float32))
        rows.append(jnp.stack(pair_logits, axis=0))  # (T, tile, H)

    out_rows = []
    segT = seg.T  # (H, D)
    for tq in range(t):
        logits = rows[tq] * scale  # (T, tile, H)
        m = jnp.max(logits, axis=0, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        acc = jnp.zeros((tile, d), jnp.float32)
        for tk in range(t):
            p_lanes = jnp.dot(p[tk].astype(jnp.bfloat16), segT,
                              preferred_element_type=jnp.float32)
            acc = acc + p_lanes * qkv[tk, :, 2 * d:].astype(jnp.float32)
        out_rows.append(acc.astype(x.dtype))

    out = jnp.stack(out_rows, axis=0).reshape(t * tile, d)
    y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
    return y + bout_ref[...].astype(jnp.float32)


def _sanitize_block(x, tile: int, n: int):
    """Zero the partial last block's out-of-range token rows (grid axis 1)."""
    if n % tile == 0:
        return x
    j = pl.program_id(1)
    return _sanitize_tokens(x, tile, n - j * tile)


def _kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, seg_ref, o_ref,
            *, t: int, heads: int, scale: float, n: int = 0,
            w1_ref=None, b1_ref=None, w2_ref=None, b2_ref=None,
            adapter_skip: bool = False):
    tt, tile, d = x_ref.shape
    x = x_ref[...].reshape(t * tile, d)  # (T*tile, D)
    x = _sanitize_block(x, tile, n or tile)
    y = _temporal_body(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref, seg_ref,
                       t, heads, scale)
    if w1_ref is not None:
        from adapt_image_models_tpu.ops.fused_qkv_attention import (
            _adapter_epilogue,
        )
        y = _adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref,
                              adapter_skip, x.dtype)
    o_ref[...] = y.astype(o_ref.dtype).reshape(t, tile, d)


def _kernel_ln(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
               bout_ref, seg_ref, o_ref, *, t: int, heads: int, scale: float,
               n: int = 0):
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _kernel_layernorm,
    )
    tt, tile, d = x_ref.shape
    x = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    x = _kernel_layernorm(x, lns_ref, lnb_ref, x_ref.dtype)
    y = _temporal_body(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref, seg_ref,
                       t, heads, scale)
    o_ref[...] = y.astype(o_ref.dtype).reshape(t, tile, d)


def _kernel_ln_adapter_res(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                           wout_ref, bout_ref, seg_ref, w1_ref, b1_ref,
                           w2_ref, b2_ref, o_ref, *, t: int, heads: int,
                           scale: float, adapter_skip: bool, n: int = 0):
    """Whole eval-mode temporal-adaptation step in one kernel:
    ``x + T_Adapter(attn_T(LN(x)))``."""
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _kernel_layernorm, _adapter_epilogue,
    )
    tt, tile, d = x_ref.shape
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    xn = _kernel_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    y = _temporal_body(xn, wqkv_ref, bqkv_ref, wout_ref, bout_ref, seg_ref,
                       t, heads, scale)
    y = _adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, adapter_skip,
                          x_ref.dtype)
    out = x0.astype(jnp.float32) + y
    o_ref[...] = out.astype(o_ref.dtype).reshape(t, tile, d)


def _kernel_with_adapter(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                         seg_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                         *, t: int, heads: int, scale: float,
                         adapter_skip: bool, n: int = 0):
    _kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, seg_ref, o_ref,
            t=t, heads=heads, scale=scale, n=n, w1_ref=w1_ref, b1_ref=b1_ref,
            w2_ref=w2_ref, b2_ref=b2_ref, adapter_skip=adapter_skip)


def _auto_tile(d: int, t: int, requested: Optional[int],
               n: Optional[int] = None, wide: bool = False) -> int:
    """Token-tile size keeping the per-cell VMEM (x + qkv + weights) under
    the 16MB scoped limit: ~ (t*tile*d*8B activations + 8*d*d*2B weights).

    Given ``n`` (the real token count), the tile is shrunk to the smallest
    8-multiple that still covers ``n`` in the same number of grid cells —
    executed rows drop from cells*128 to ~round_up(n, 8) (ViT-B: 256 -> 208,
    ~19% of the kernel's projection FLOPs)."""
    if requested is not None:
        return requested
    if _use_full_core(t):
        if wide and d <= _WIDE_MAX_D:
            # EVAL-path tile: one kernel invocation covers as many tokens
            # as the verified VMEM point allows (t*tile <= 832 rows — the
            # (8, 104, 768) ViT-B cell measured on-chip). Fewer grid cells
            # amortize per-cell pipeline overhead: model-level sweep at
            # batch 512 gave tile 104 -> 345.0 clips/s vs the 128-row
            # default's 341 (tile 32: 337.9, tile 64: 326.4 — those cover
            # more padded rows). d > 768 keeps the narrow default until a
            # wide cell is VMEM-verified on-chip at that width.
            #
            # T > 16 caps at 512 rows: the grouped core's stacked score
            # block grows with t*gw (256 rows at T=32), and the 768-row
            # (32, 24, 768) cell is a real compile-time VMEM OOM while
            # (32, 16, 768) runs at 434 us/clip/layer (r4, on-chip).
            cap = 832 if t <= 16 else _LONG_WIDE_CAP
            tile = max(8, (cap // t) // 8 * 8)
        else:
            # backward/train cells hold more transients: ~128 rows per
            # block maximizes MXU occupancy while the (T*tile)^2 mask
            # waste stays bounded
            tile = max(8, _round_up(128 // t, 8))
    else:
        tile = 128
        # segment-core cells also hold per-frame logits/prob transients and
        # the fp32 epilogue; the old 14M/`tile > 32` bound left T=32 cells
        # at a measured 29.2M -> compile-time VMEM OOM. 13M calibrated
        # on-chip at T=32/d=768: estimate 12.5M (tile 16) fits and runs
        # +39% over tile 8 (35.4 -> 49.3 clips/s), estimate 15.7M (tile 32)
        # is a real 29.2M OOM
        while tile > 8 and (t * tile * d * 8 + 8 * d * d * 2) > 13 * 2 ** 20:
            tile //= 2
    if n is not None and n > 0:
        cells = -(-n // tile)
        tile = -(-(-(-n // cells)) // 8) * 8  # round_up(ceil(n/cells), 8)
    return tile


def _segment_matrix(d: int, num_heads: int) -> jax.Array:
    hd = d // num_heads
    seg = np.zeros((d, num_heads), np.float32)
    for h in range(num_heads):
        seg[h * hd:(h + 1) * hd, h] = 1.0
    return jnp.asarray(seg, jnp.bfloat16)


def _call_temporal(kernel, xr, args, b, t, n, tile, d, num_heads,
                   extra_specs=(), extra_args=()):
    """Grid (B, cdiv(N, tile)) over the UNPADDED (B*T, N, D) array; the
    last block is partial (masked read/write)."""
    n_cells = pl.cdiv(n, tile)
    x_spec = pl.BlockSpec((t, tile, d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, num_heads), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    bt = b * t
    n_pad = n_cells * tile
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * t, n, d), xr.dtype),
        grid=(b, n_cells),
        in_specs=[x_spec, *extra_specs, *weight_specs],
        out_specs=pl.BlockSpec((t, tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams("parallel", "parallel"),
        cost_estimate=pl.CostEstimate(
            # qkv + out projections, plus the frame-axis attention core
            # (qk^T and attn@v, each 2*b*n*t*t*d)
            flops=2 * bt * n_pad * d * 4 * d + 2 * b * n_pad * t * t * d * 2,
            bytes_accessed=2 * (2 * bt * n_pad * d * 2 + 4 * d * d),
            transcendentals=b * n_pad * num_heads * t * t,
        ),
    )(xr, *extra_args, *args)


def fused_temporal_attention(x: jax.Array, w_qkv: jax.Array, b_qkv: jax.Array,
                             w_out: jax.Array, b_out: jax.Array,
                             num_frames: int, num_heads: int,
                             tile: Optional[int] = None) -> jax.Array:
    """x: (B*T, N, D) post-LN tokens -> (B*T, N, D) temporal-attention
    branch output (qkv -> frame-axis attention per token -> out proj)."""
    bt, n, d = x.shape
    tile = _auto_tile(d, num_frames, tile, n, wide=True)
    t = num_frames
    b = _split_frames(bt, t)
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    seg = _segment_matrix(d, num_heads)
    kernel = functools.partial(_kernel, t=t, heads=num_heads, scale=scale,
                               n=n)
    return _call_temporal(kernel, x, (w_qkv, b_qkv, w_out, b_out, seg),
                          b, t, n, tile, d, num_heads)


def fused_ln_temporal_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                w_out, b_out, num_frames: int,
                                num_heads: int,
                                tile: Optional[int] = None) -> jax.Array:
    """Raw residual stream in; the fp32 LN runs inside the kernel."""
    bt, n, d = x.shape
    tile = _auto_tile(d, num_frames, tile, n, wide=True)
    t = num_frames
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    seg = _segment_matrix(d, num_heads)
    kernel = functools.partial(_kernel_ln, t=t, heads=num_heads, scale=scale,
                               n=n)
    ln_specs = [
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
    ]
    return _call_temporal(kernel, x, (w_qkv, b_qkv, w_out, b_out, seg),
                          b, t, n, tile, d, num_heads,
                          extra_specs=ln_specs, extra_args=(ln_scale, ln_bias))


def fused_temporal_attention_adapter(x, w_qkv, b_qkv, w_out, b_out,
                                     w1, b1, w2, b2, num_frames: int,
                                     num_heads: int, adapter_skip: bool,
                                     tile: Optional[int] = None) -> jax.Array:
    """Temporal branch + fused T_Adapter epilogue."""
    bt, n, d = x.shape
    tile = _auto_tile(d, num_frames, tile, n, wide=True)
    t = num_frames
    b = _split_frames(bt, t)
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    seg = _segment_matrix(d, num_heads)
    dh = w1.shape[1]

    kernel = functools.partial(_kernel_with_adapter, t=t, heads=num_heads,
                               scale=scale, adapter_skip=adapter_skip, n=n)
    adapter_specs = [
        pl.BlockSpec((d, dh), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
    ]
    n_cells = pl.cdiv(n, tile)
    x_spec = pl.BlockSpec((t, tile, d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, num_heads), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * t, n, d), x.dtype),
        grid=(b, n_cells),
        in_specs=[x_spec, *weight_specs, *adapter_specs],
        out_specs=pl.BlockSpec((t, tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams("parallel", "parallel"),
    )(x, w_qkv, b_qkv, w_out, b_out, seg, w1, b1, w2, b2)


# ---------------------------------------------------------------------------
# XLA reference implementations


def _ref_impl(x, w_qkv, b_qkv, w_out, b_out, num_frames, num_heads):
    bt, n, d = x.shape
    t = num_frames
    b = _split_frames(bt, t)
    hd = d // num_heads
    qkv = x @ w_qkv.astype(x.dtype) + b_qkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, t, n, num_heads, hd)
    kh = k.reshape(b, t, n, num_heads, hd)
    vh = v.reshape(b, t, n, num_heads, hd)
    logits = jnp.einsum("bqnhd,bknhd->bnhqk", qh, kh,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnhqk,bknhd->bqnhd", p.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(bt, n, d)
    return out @ w_out.astype(x.dtype) + b_out.astype(x.dtype)


def _ref_ln_impl(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                 num_frames, num_heads):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return _ref_impl(y.astype(x.dtype), w_qkv, b_qkv, w_out, b_out,
                     num_frames, num_heads)


def _ref_adapter_impl(x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
                      num_frames, num_heads, adapter_skip):
    y = _ref_impl(x, w_qkv, b_qkv, w_out, b_out, num_frames, num_heads)
    a = jax.nn.gelu(y.astype(jnp.float32) @ w1.astype(jnp.float32)
                    + b1.astype(jnp.float32), approximate=True)  # tanh-gelu: matches the kernels
    z = (a @ w2.astype(jnp.float32) + b2.astype(jnp.float32)).astype(y.dtype)
    return y + z if adapter_skip else z


# ---------------------------------------------------------------------------
# custom-VJP entry points


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_temporal_adapter_block(x, w_qkv, b_qkv, w_out, b_out,
                                 w1, b1, w2, b2, num_frames, num_heads,
                                 adapter_skip):
    return fused_temporal_attention_adapter(
        x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
        num_frames, num_heads, adapter_skip)


def _fwd_ad(x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
            num_frames, num_heads, adapter_skip):
    y = fused_temporal_attention_adapter(
        x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
        num_frames, num_heads, adapter_skip)
    return y, (x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2)


def _bwd_ad(num_frames, num_heads, adapter_skip, res, g):
    _, vjp = jax.vjp(
        lambda *a: _ref_adapter_impl(*a, num_frames, num_heads, adapter_skip),
        *res)
    return vjp(g)


fused_temporal_adapter_block.defvjp(_fwd_ad, _bwd_ad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_temporal_block(x, w_qkv, b_qkv, w_out, b_out, num_frames, num_heads):
    return fused_temporal_attention(x, w_qkv, b_qkv, w_out, b_out,
                                    num_frames, num_heads)


def _fwd(x, w_qkv, b_qkv, w_out, b_out, num_frames, num_heads):
    y = fused_temporal_attention(x, w_qkv, b_qkv, w_out, b_out,
                                 num_frames, num_heads)
    return y, (x, w_qkv, b_qkv, w_out, b_out)


def _bwd(num_frames, num_heads, res, g):
    x, w_qkv, b_qkv, w_out, b_out = res
    _, vjp = jax.vjp(lambda *a: _ref_impl(*a, num_frames, num_heads),
                     x, w_qkv, b_qkv, w_out, b_out)
    return vjp(g)


fused_temporal_block.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_temporal_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                            num_frames, num_heads):
    return fused_ln_temporal_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                       w_out, b_out, num_frames, num_heads)


def _fwd_ln(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
            num_frames, num_heads):
    y = fused_ln_temporal_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                    w_out, b_out, num_frames, num_heads)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)


def _bwd_ln(num_frames, num_heads, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_ln_impl(*a, num_frames, num_heads), *res)
    return vjp(g)


fused_ln_temporal_block.defvjp(_fwd_ln, _bwd_ln)


def fused_ln_temporal_adapter_residual(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                       w_out, b_out, w1, b1, w2, b2,
                                       num_frames: int, num_heads: int,
                                       adapter_skip: bool,
                                       tile: Optional[int] = None):
    """Raw residual stream -> ``x + T_Adapter(attn_T(LN(x)))`` in one
    kernel (the whole temporal-adaptation step of an AIM block, eval)."""
    bt, n, d = x.shape
    tile = _auto_tile(d, num_frames, tile, n, wide=True)
    t = num_frames
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    seg = _segment_matrix(d, num_heads)
    dh = w1.shape[1]
    kernel = functools.partial(_kernel_ln_adapter_res, t=t, heads=num_heads,
                               scale=scale, adapter_skip=adapter_skip, n=n)
    ln_specs = [
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
    ]
    adapter_specs = [
        pl.BlockSpec((d, dh), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
    ]
    n_cells = pl.cdiv(n, tile)
    x_spec = pl.BlockSpec((t, tile, d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, num_heads), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * t, n, d), x.dtype),
        grid=(b, n_cells),
        in_specs=[x_spec, *ln_specs, *weight_specs, *adapter_specs],
        out_specs=pl.BlockSpec((t, tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams("parallel", "parallel"),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, seg,
      w1, b1, w2, b2)


def _ref_ln_adapter_res_impl(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, w1, b1, w2, b2, num_frames, num_heads,
                             adapter_skip):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xn = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    y = _ref_impl(xn, w_qkv, b_qkv, w_out, b_out, num_frames, num_heads)
    a = jax.nn.gelu(y.astype(jnp.float32) @ w1.astype(jnp.float32)
                    + b1.astype(jnp.float32), approximate=True)  # tanh-gelu: matches the kernels
    z = a @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    z = y.astype(jnp.float32) + z if adapter_skip else z
    return (x.astype(jnp.float32) + z).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_temporal_step_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                              b_out, w1, b1, w2, b2, num_frames, num_heads,
                              adapter_skip):
    return fused_ln_temporal_adapter_residual(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
        num_frames, num_heads, adapter_skip)


def _fwd_step(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, w1, b1, w2,
              b2, num_frames, num_heads, adapter_skip):
    y = fused_ln_temporal_adapter_residual(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
        num_frames, num_heads, adapter_skip)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
               w1, b1, w2, b2)


def _bwd_step(num_frames, num_heads, adapter_skip, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_ln_adapter_res_impl(
        *a, num_frames, num_heads, adapter_skip), *res)
    return vjp(g)


fused_temporal_step_block.defvjp(_fwd_step, _bwd_step)


# ---------------------------------------------------------------------------
# Pallas BACKWARD kernel for the LN+temporal-attention block (train path).
# Same contract as fused_qkv_attention._bwd_ln_pallas: the kernel computes
# dX (through LN -> QKV -> frame-axis softmax -> out-proj) plus the
# intermediates (dqkv, dy, y, o) from which XLA forms weight/LN cotangents
# (DCE'd entirely in the frozen-CLIP regime). Uses the masked-full core, so
# it covers T <= 16; longer clips fall back to the XLA-remat backward.


def _grouped_core_fwd_dispatch(q, k, v, t, tile, heads, scale, dt,
                               stacked: bool = True):
    """Grouped temporal-core forward over the whole (t*tile, D) block."""
    rows, d = q.shape
    group = _core_group(t)
    if group >= tile:
        return _masked_full_core(q, k, v, t, tile, heads, scale, dt, stacked)
    q3 = q.reshape(t, tile, d)
    k3 = k.reshape(t, tile, d)
    v3 = v.reshape(t, tile, d)
    o_gs = []
    for g0 in range(0, tile, group):
        ge = min(tile, g0 + group)
        gw = ge - g0
        og = _masked_full_core(
            q3[:, g0:ge, :].reshape(t * gw, d),
            k3[:, g0:ge, :].reshape(t * gw, d),
            v3[:, g0:ge, :].reshape(t * gw, d), t, gw, heads, scale, dt,
            stacked)
        o_gs.append(og.reshape(t, gw, d))
    return jnp.concatenate(o_gs, axis=1).reshape(rows, d)


def _grouped_core_bwd(qg, kg, vg, dog, gw, heads, hd, scale, dt):
    """One token group's temporal-core backward: all inputs (t*gw, D).
    Returns (o_group, dqkv_group)."""
    grows = qg.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 1)
    maskadd = jnp.where((ri % gw) == (ci % gw), jnp.float32(0.0),
                        jnp.float32(MASK_VALUE))
    o_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(heads):
        qh = qg[:, h * hd:(h + 1) * hd]
        kh = kg[:, h * hd:(h + 1) * hd]
        vh = vg[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + maskadd
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        pb = p.astype(dt)
        oh = jax.lax.dot(pb, vh, preferred_element_type=jnp.float32)
        o_parts.append(oh.astype(dt))

        do_h = dog[:, h * hd:(h + 1) * hd].astype(dt)
        dv = jax.lax.dot_general(pb, do_h, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_h, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rowdot = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - rowdot)).astype(dt)  # masked pairs: p=0 -> ds=0
        dq = jax.lax.dot(ds, kh,
                         preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_parts.append(dq.astype(dt))
        dk_parts.append(dk.astype(dt))
        dv_parts.append(dv.astype(dt))
    og = jnp.concatenate(o_parts, axis=1)
    dqkvg = jnp.concatenate(
        [jnp.concatenate(dq_parts, axis=1),
         jnp.concatenate(dk_parts, axis=1),
         jnp.concatenate(dv_parts, axis=1)], axis=1)
    return og, dqkvg


def _grouped_core_bwd_dispatch(q, k, v, do, t, tile, heads, hd, scale, dt):
    """Grouped temporal-core backward over the whole (t*tile, D) block."""
    rows, d = q.shape
    group = _core_group(t)
    if group >= tile:
        return _grouped_core_bwd(q, k, v, do, tile, heads, hd, scale, dt)
    q3 = q.reshape(t, tile, d)
    k3 = k.reshape(t, tile, d)
    v3 = v.reshape(t, tile, d)
    do3 = do.reshape(t, tile, d)
    o_gs, dqkv_gs = [], []
    for g0 in range(0, tile, group):
        ge = min(tile, g0 + group)
        gw = ge - g0
        og, dqkvg = _grouped_core_bwd(
            q3[:, g0:ge, :].reshape(t * gw, d),
            k3[:, g0:ge, :].reshape(t * gw, d),
            v3[:, g0:ge, :].reshape(t * gw, d),
            do3[:, g0:ge, :].reshape(t * gw, d), gw, heads, hd, scale, dt)
        o_gs.append(og.reshape(t, gw, d))
        dqkv_gs.append(dqkvg.reshape(t, gw, 3 * d))
    return (jnp.concatenate(o_gs, axis=1).reshape(rows, d),
            jnp.concatenate(dqkv_gs, axis=1).reshape(rows, 3 * d))


def _bwd_temporal_body_full(x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                            wout_ref, g, t: int, heads: int, scale: float,
                            with_ln: bool = True):
    rows, d = x0.shape
    tile = rows // t
    hd = d // heads
    dt = x0.dtype

    if with_ln:
        x32 = x0.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-5)
        xhat = (x32 - mean) * rstd
        lns = lns_ref[...].astype(jnp.float32)
        y = (xhat * lns + lnb_ref[...].astype(jnp.float32)).astype(dt)
    else:
        y = x0

    w = wqkv_ref[...]
    bq = bqkv_ref[...]
    q = (jnp.dot(y, w[:, :d], preferred_element_type=jnp.float32)
         + bq[:d].astype(jnp.float32)).astype(dt)
    k = (jnp.dot(y, w[:, d:2 * d], preferred_element_type=jnp.float32)
         + bq[d:2 * d].astype(jnp.float32)).astype(dt)
    v = (jnp.dot(y, w[:, 2 * d:], preferred_element_type=jnp.float32)
         + bq[2 * d:].astype(jnp.float32)).astype(dt)

    do = jax.lax.dot_general(g.astype(dt), wout_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    o, dqkv = _grouped_core_bwd_dispatch(q, k, v, do, t, tile, heads, hd,
                                         scale, dt)
    dy = jax.lax.dot_general(dqkv, w, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if with_ln:
        dxhat = dy * lns
        mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
        mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = rstd * (dxhat - mdx - xhat * mdxx)
    else:
        dx = dy
    return dx, dqkv, dy, y, o


def _kernel_ln_bwd(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                   g_ref, dx_ref, dqkv_ref, dy_ref, y_ref, o_ref,
                   *, t: int, heads: int, scale: float, n: int):
    tt, tile, d = x_ref.shape
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    g = _sanitize_block(g_ref[...].reshape(t * tile, d), tile, n or tile)
    dx, dqkv, dy, y, o = _bwd_temporal_body_full(
        x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, g,
        t, heads, scale)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(t, tile, d)
    dqkv_ref[...] = dqkv.astype(dqkv_ref.dtype).reshape(t, tile, 3 * d)
    dy_ref[...] = dy.astype(dy_ref.dtype).reshape(t, tile, d)
    y_ref[...] = y.astype(y_ref.dtype).reshape(t, tile, d)
    o_ref[...] = o.astype(o_ref.dtype).reshape(t, tile, d)


def fused_ln_temporal_attention_bwd(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                    w_out, g, num_frames: int,
                                    num_heads: int,
                                    tile: Optional[int] = None):
    """Pallas backward core (full-core layout, T <= 16):
    returns (dx, dqkv, dy, y, o)."""
    bt, n, d = x.shape
    t = num_frames
    requested = tile is not None
    tile = _auto_tile(d, t, tile, n)
    # backward holds 9 double-buffered row blocks: shrink the tile until
    # the per-cell estimate fits the 16M VMEM scope (ViT-L widths); an
    # explicitly requested tile is honored
    while (not requested and tile > 8
           and (18 * t * tile * d * 2 + 4 * d * d * 2) > 14 * 2 ** 20):
        tile = max(8, tile // 2)
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    n_cells = pl.cdiv(n, tile)
    kernel = functools.partial(_kernel_ln_bwd, t=t, heads=num_heads,
                               scale=scale, n=n)

    blk = lambda w: pl.BlockSpec((t, tile, w), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            # stream-dtype cotangents (see fused_qkv_attention: fp32 adds
            # VMEM pressure for no end-to-end precision gain)
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((bt, n, 3 * d), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # dy
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # y
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # o
        ),
        grid=(b, n_cells),
        in_specs=[
            blk(d), vec, vec,
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            blk(d),
        ],
        out_specs=(blk(d), blk(3 * d), blk(d), blk(d), blk(d)),
        compiler_params=_cparams("parallel", "parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * n_cells * tile * d * 8 * d
                  + 2 * b * n_cells * tile * t * t * d * 6,
            bytes_accessed=2 * (5 * bt * n * d * 2 + 4 * d * d),
            transcendentals=b * n * num_heads * t * t,
        ),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g)


def _bwd_ln_pallas(num_frames, num_heads, res, g):
    """Kernel-speed backward for ``fused_ln_temporal_block``."""
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out = res
    dx, dqkv, dy, y, o = fused_ln_temporal_attention_bwd(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g.astype(x.dtype),
        num_frames, num_heads)
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _attention_weight_cotangents,
    )
    dwqkv, dbqkv, dwout, dbout, dgamma, dbeta = _attention_weight_cotangents(
        g, dqkv, y, o, x=x, dy=dy)
    cast = lambda tl, like: tl.astype(like.dtype)
    return (cast(dx, x), cast(dgamma, ln_scale), cast(dbeta, ln_bias),
            cast(dwqkv, w_qkv), cast(dbqkv, b_qkv), cast(dwout, w_out),
            cast(dbout, b_out))


def _bwd_ln_dispatch(num_frames, num_heads, res, g):
    if _use_full_core(num_frames) and num_frames <= FULL_BWD_MAX_T:
        return _bwd_ln_pallas(num_frames, num_heads, res, g)
    d = res[0].shape[-1]
    if _seg_bwd_vmem_fits(num_frames, 8, d):
        return _bwd_ln_pallas_segment(num_frames, num_heads, res, g)
    # T=32 at ViT-B/L widths: the 5-output segment cell measured 19.12M >
    # 16M VMEM on-chip even at the minimum tile — take the exact XLA-remat
    # backward instead of a compile-time OOM (train steps never come here:
    # fused_temporal_train_step has its own two-kernel composition)
    return _bwd_ln(num_frames, num_heads, res, g)


fused_ln_temporal_block.defvjp(_fwd_ln, _bwd_ln_dispatch)


def _kernel_plain_bwd(x_ref, wqkv_ref, bqkv_ref, wout_ref, g_ref,
                      dx_ref, dqkv_ref, o_ref,
                      *, t: int, heads: int, scale: float, n: int):
    tt, tile, d = x_ref.shape
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    g = _sanitize_block(g_ref[...].reshape(t * tile, d), tile, n or tile)
    dx, dqkv, _, _, o = _bwd_temporal_body_full(
        x0, None, None, wqkv_ref, bqkv_ref, wout_ref, g, t, heads, scale,
        with_ln=False)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(t, tile, d)
    dqkv_ref[...] = dqkv.astype(dqkv_ref.dtype).reshape(t, tile, 3 * d)
    o_ref[...] = o.astype(o_ref.dtype).reshape(t, tile, d)


def fused_temporal_attention_bwd(x, w_qkv, b_qkv, w_out, g,
                                 num_frames: int, num_heads: int,
                                 tile: Optional[int] = None):
    """Pallas backward core for the plain temporal block (T <= 16):
    returns (dx, dqkv, o)."""
    bt, n, d = x.shape
    t = num_frames
    requested = tile is not None
    tile = _auto_tile(d, t, tile, n)
    while (not requested and tile > 8
           and (18 * t * tile * d * 2 + 4 * d * d * 2) > 14 * 2 ** 20):
        tile = max(8, tile // 2)
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    n_cells = pl.cdiv(n, tile)
    kernel = functools.partial(_kernel_plain_bwd, t=t, heads=num_heads,
                               scale=scale, n=n)
    blk = lambda w: pl.BlockSpec((t, tile, w), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((bt, n, 3 * d), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # o
        ),
        grid=(b, n_cells),
        in_specs=[
            blk(d),
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            blk(d),
        ],
        out_specs=(blk(d), blk(3 * d), blk(d)),
        compiler_params=_cparams("parallel", "parallel"),
    )(x, w_qkv, b_qkv, w_out, g)


def _bwd_plain_pallas(num_frames, num_heads, res, g):
    x, w_qkv, b_qkv, w_out, b_out = res
    dx, dqkv, o = fused_temporal_attention_bwd(
        x, w_qkv, b_qkv, w_out, g.astype(x.dtype), num_frames, num_heads)
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _attention_weight_cotangents,
    )
    dwqkv, dbqkv, dwout, dbout = _attention_weight_cotangents(
        g, dqkv, x, o)  # y == x for the plain (no-LN) block
    cast = lambda tl, like: tl.astype(like.dtype)
    return (cast(dx, x), cast(dwqkv, w_qkv), cast(dbqkv, b_qkv),
            cast(dwout, w_out), cast(dbout, b_out))


def _bwd_plain_dispatch(num_frames, num_heads, res, g):
    if _use_full_core(num_frames) and num_frames <= FULL_BWD_MAX_T:
        return _bwd_plain_pallas(num_frames, num_heads, res, g)
    return _bwd(num_frames, num_heads, res, g)


fused_temporal_block.defvjp(_fwd, _bwd_plain_dispatch)


def _bwd_temporal_body_segment(x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                               wout_ref, seg_ref, g, t: int, heads: int,
                               scale: float, with_ln: bool = True):
    """Segment-core backward for long frame axes (T > 16), mirroring the
    segment-sum forward: per (tq, tk) pair the head quantities come from a
    VPU multiply + one (tile, D) @ (D, H) segment matmul, and the lane
    broadcast uses the transposed segment matrix. Same output contract as
    the full-core backward: (dx, dqkv, dy, y, o)."""
    rows, d = x0.shape
    tile = rows // t
    dt = x0.dtype

    if with_ln:
        x32 = x0.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-5)
        xhat = (x32 - mean) * rstd
        lns = lns_ref[...].astype(jnp.float32)
        y = (xhat * lns + lnb_ref[...].astype(jnp.float32)).astype(dt)
    else:
        y = x0

    from adapt_image_models_tpu.ops.fused_qkv_attention import _project_qkv
    qkv = _project_qkv(y, wqkv_ref, bqkv_ref).reshape(t, tile, 3 * d)
    seg = seg_ref[...]            # (D, H) bf16 0/1
    segT = seg.T                  # (H, D)

    # recompute probabilities p[tq]: (T, tile, H)
    ps = []
    for tq in range(t):
        q_tq = qkv[tq, :, :d]
        pair_logits = []
        for tk in range(t):
            prod = (q_tq * qkv[tk, :, d:2 * d]).astype(jnp.bfloat16)
            pair_logits.append(jnp.dot(prod, seg,
                                       preferred_element_type=jnp.float32))
        logits = jnp.stack(pair_logits, axis=0) * scale
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        ps.append(e / jnp.sum(e, axis=0, keepdims=True))

    # o[tq] + do
    out_rows = []
    do = jax.lax.dot_general(g.astype(dt), wout_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    do = do.reshape(t, tile, d)
    for tq in range(t):
        acc = jnp.zeros((tile, d), jnp.float32)
        for tk in range(t):
            p_lanes = jnp.dot(ps[tq][tk].astype(jnp.bfloat16), segT,
                              preferred_element_type=jnp.float32)
            acc = acc + p_lanes * qkv[tk, :, 2 * d:].astype(jnp.float32)
        out_rows.append(acc.astype(dt))
    o = jnp.stack(out_rows, axis=0).reshape(rows, d)

    # dp[tq, tk] per head: (do[tq] * v[tk]) @ seg; softmax bwd over tk
    dq_rows = [None] * t
    dk_acc = [jnp.zeros((tile, d), jnp.float32) for _ in range(t)]
    dv_acc = [jnp.zeros((tile, d), jnp.float32) for _ in range(t)]
    for tq in range(t):
        do_tq = do[tq].astype(dt)
        dps = []
        for tk in range(t):
            prod = (do_tq * qkv[tk, :, 2 * d:]).astype(jnp.bfloat16)
            dps.append(jnp.dot(prod, seg,
                               preferred_element_type=jnp.float32))
        dp = jnp.stack(dps, axis=0)              # (T, tile, H)
        p = ps[tq]
        rowdot = jnp.sum(dp * p, axis=0, keepdims=True)
        ds = p * (dp - rowdot)                   # (T, tile, H) fp32
        q_tq = qkv[tq, :, :d].astype(jnp.float32)
        dq = jnp.zeros((tile, d), jnp.float32)
        for tk in range(t):
            ds_lanes = jnp.dot(ds[tk].astype(jnp.bfloat16), segT,
                               preferred_element_type=jnp.float32)
            k_tk = qkv[tk, :, d:2 * d].astype(jnp.float32)
            dq = dq + ds_lanes * k_tk
            dk_acc[tk] = dk_acc[tk] + ds_lanes * q_tq
            p_lanes = jnp.dot(p[tk].astype(jnp.bfloat16), segT,
                              preferred_element_type=jnp.float32)
            dv_acc[tk] = dv_acc[tk] + p_lanes * do[tq]
        dq_rows[tq] = dq * scale

    dq = jnp.stack(dq_rows, axis=0).reshape(rows, d).astype(dt)
    dk = (jnp.stack(dk_acc, axis=0) * scale).reshape(rows, d).astype(dt)
    dv = jnp.stack(dv_acc, axis=0).reshape(rows, d).astype(dt)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)

    dy = jax.lax.dot_general(dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if with_ln:
        dxhat = dy * lns
        mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
        mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = rstd * (dxhat - mdx - xhat * mdxx)
    else:
        dx = dy
    return dx, dqkv, dy, y, o


def _kernel_ln_bwd_segment(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                           wout_ref, seg_ref, g_ref, dx_ref, dqkv_ref,
                           dy_ref, y_ref, o_ref, *, t: int, heads: int,
                           scale: float, n: int):
    tt, tile, d = x_ref.shape
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    g = _sanitize_block(g_ref[...].reshape(t * tile, d), tile, n or tile)
    dx, dqkv, dy, y, o = _bwd_temporal_body_segment(
        x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, seg_ref, g,
        t, heads, scale)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(t, tile, d)
    dqkv_ref[...] = dqkv.astype(dqkv_ref.dtype).reshape(t, tile, 3 * d)
    dy_ref[...] = dy.astype(dy_ref.dtype).reshape(t, tile, d)
    y_ref[...] = y.astype(y_ref.dtype).reshape(t, tile, d)
    o_ref[...] = o.astype(o_ref.dtype).reshape(t, tile, d)


def _seg_bwd_vmem_fits(t: int, tile: int, d: int) -> bool:
    """Whether the 5-output segment backward cell fits the VMEM scope.

    Anchored on the real chip: (t=32, tile=8, d=768) measured 19.12M >
    16M — the 18-blocks model under-counted the per-frame logit/prob/
    accumulator transients, so the coefficient is 30 (estimate 16.5M,
    correctly rejected) rather than 18 (11.8M, wrongly accepted)."""
    return (30 * t * tile * d * 2 + 4 * d * d * 2) <= 14 * 2 ** 20


def fused_ln_temporal_attention_bwd_segment(x, ln_scale, ln_bias, w_qkv,
                                            b_qkv, w_out, g,
                                            num_frames: int, num_heads: int,
                                            tile: Optional[int] = None):
    """Segment-core Pallas backward (T > 16): returns (dx, dqkv, dy, y, o)."""
    bt, n, d = x.shape
    t = num_frames
    requested = tile is not None
    tile = _auto_tile(d, t, tile, n)
    while (not requested and tile > 8
           and not _seg_bwd_vmem_fits(t, tile, d)):
        tile = max(8, tile // 2)
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    seg = _segment_matrix(d, num_heads)
    n_cells = pl.cdiv(n, tile)
    kernel = functools.partial(_kernel_ln_bwd_segment, t=t, heads=num_heads,
                               scale=scale, n=n)
    blk = lambda w: pl.BlockSpec((t, tile, w), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((bt, n, 3 * d), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # dy
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # y
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),       # o
        ),
        grid=(b, n_cells),
        in_specs=[
            blk(d), vec, vec,
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, num_heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            blk(d),
        ],
        out_specs=(blk(d), blk(3 * d), blk(d), blk(d), blk(d)),
        compiler_params=_cparams("parallel", "parallel"),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, seg, g)


def _bwd_ln_pallas_segment(num_frames, num_heads, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out = res
    dx, dqkv, dy, y, o = fused_ln_temporal_attention_bwd_segment(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g.astype(x.dtype),
        num_frames, num_heads)
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _attention_weight_cotangents,
    )
    dwqkv, dbqkv, dwout, dbout, dgamma, dbeta = _attention_weight_cotangents(
        g, dqkv, y, o, x=x, dy=dy)
    cast = lambda tl, like: tl.astype(like.dtype)
    return (cast(dx, x), cast(dgamma, ln_scale), cast(dbeta, ln_bias),
            cast(dwqkv, w_qkv), cast(dbqkv, b_qkv), cast(dwout, w_out),
            cast(dbout, b_out))


def _kernel_ln_bwd_dx_segment(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                              wout_ref, seg_ref, g_ref, dx_ref, *, t: int,
                              heads: int, scale: float, n: int):
    tt, tile, d = x_ref.shape
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    g = _sanitize_block(g_ref[...].reshape(t * tile, d), tile, n or tile)
    dx, _, _, _, _ = _bwd_temporal_body_segment(
        x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, seg_ref, g,
        t, heads, scale)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(t, tile, d)


def fused_ln_temporal_attention_bwd_dx_segment(x, ln_scale, ln_bias, w_qkv,
                                               b_qkv, w_out, g,
                                               num_frames: int,
                                               num_heads: int,
                                               tile: Optional[int] = None):
    """dX-only segment-core backward (T > 16, frozen attention weights).

    The 5-output variant's dqkv/dy/y/o blocks exist solely for weight
    cotangents that the AIM freeze regime always DCEs — but a kernel output
    cannot be DCE'd, so at T=32 their double-buffered blocks pushed the
    cell to a measured 19.12M > 16M scoped VMEM on the real chip (the
    flagship 32-frame K400 recipe could not train). Emitting dx alone
    drops ~4.7M and Mosaic dead-code-eliminates the o/y computations."""
    bt, n, d = x.shape
    t = num_frames
    requested = tile is not None
    tile = _auto_tile(d, t, tile, n)
    while (not requested and tile > 8
           and (18 * t * tile * d * 2 + 4 * d * d * 2) > 14 * 2 ** 20):
        tile = max(8, tile // 2)
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    seg = _segment_matrix(d, num_heads)
    n_cells = pl.cdiv(n, tile)
    kernel = functools.partial(_kernel_ln_bwd_dx_segment, t=t,
                               heads=num_heads, scale=scale, n=n)
    blk = lambda w: pl.BlockSpec((t, tile, w), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bt, n, d), x.dtype),
        grid=(b, n_cells),
        in_specs=[
            blk(d), vec, vec,
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, num_heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            blk(d),
        ],
        out_specs=blk(d),
        compiler_params=_cparams("parallel", "parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * n_cells * tile * d * 8 * d
                  + 2 * b * n_cells * tile * t * t * d * 6,
            bytes_accessed=2 * (3 * bt * n * d * 2 + 4 * d * d),
            transcendentals=b * n * num_heads * t * t,
        ),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, seg, g)


# ---------------------------------------------------------------------------
# FROZEN-backward variant (round 3; mirror of
# fused_qkv_attention.fused_ln_attention_block_frozen): dX only — the
# dqkv/dy/y/o outputs exist purely for weight cotangents that the AIM
# freeze regime always DCEs. The smaller VMEM footprint also lets ViT-L
# widths keep larger token tiles.


def _kernel_ln_bwd_dx(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                      g_ref, dx_ref, *, t: int, heads: int, scale: float,
                      n: int):
    tt, tile, d = x_ref.shape
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    g = _sanitize_block(g_ref[...].reshape(t * tile, d), tile, n or tile)
    dx, _, _, _, _ = _bwd_temporal_body_full(
        x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, g,
        t, heads, scale)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(t, tile, d)


def fused_ln_temporal_attention_bwd_dx(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                       w_out, g, num_frames: int,
                                       num_heads: int,
                                       tile: Optional[int] = None):
    """dX-only Pallas backward for the LN+temporal block (full core)."""
    bt, n, d = x.shape
    t = num_frames
    requested = tile is not None
    tile = _auto_tile(d, t, tile, n)
    # 3 row units (x, g, dx) double-buffered + resident weights
    while (not requested and tile > 8
           and (6 * t * tile * d * 2 + 4 * d * d * 2) > 14 * 2 ** 20):
        tile = max(8, tile // 2)
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    n_cells = pl.cdiv(n, tile)
    kernel = functools.partial(_kernel_ln_bwd_dx, t=t, heads=num_heads,
                               scale=scale, n=n)
    blk = lambda w: pl.BlockSpec((t, tile, w), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bt, n, d), x.dtype),
        grid=(b, n_cells),
        in_specs=[
            blk(d), vec, vec,
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            blk(d),
        ],
        out_specs=blk(d),
        compiler_params=_cparams("parallel", "parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * n_cells * tile * d * 8 * d
                  + 2 * b * n_cells * tile * t * t * d * 6,
            bytes_accessed=2 * (3 * bt * n * d * 2 + 4 * d * d),
            transcendentals=b * n * num_heads * t * t,
        ),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_temporal_block_frozen(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                   w_out, b_out, num_frames, num_heads):
    """LN + frame-axis attention with a dX-only backward (frozen CLIP
    weights — apis/train enforces)."""
    return fused_ln_temporal_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                       w_out, b_out, num_frames, num_heads)


def _fwd_ln_frozen(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                   num_frames, num_heads):
    y = fused_ln_temporal_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                    w_out, b_out, num_frames, num_heads)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)


def _bwd_ln_frozen(num_frames, num_heads, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out = res
    if _use_full_core(num_frames):
        dx = fused_ln_temporal_attention_bwd_dx(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g.astype(x.dtype),
            num_frames, num_heads)
    else:  # 32-frame clips: exact dx via the dX-only segment-core backward
        dx = fused_ln_temporal_attention_bwd_dx_segment(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g.astype(x.dtype),
            num_frames, num_heads)
    z = jnp.zeros_like
    return (dx, z(ln_scale), z(ln_bias), z(w_qkv), z(b_qkv), z(w_out),
            z(b_out))


fused_ln_temporal_block_frozen.defvjp(_fwd_ln_frozen, _bwd_ln_frozen)


# ---------------------------------------------------------------------------
# Whole-step TRAIN op (round 3; mirror of
# fused_qkv_attention.fused_spatial_train_step): LN -> temporal attention ->
# T_Adapter -> drop-path gate -> residual, in one kernel both directions.
# The gate is per (sample, frame): the AIM drop-path masks the leading
# B*T axis, and a cell spans all T frames of one sample, so the gate rides
# in as a (B, T) input applied per frame row-block.


def _kernel_temporal_step_bwd_dx(x_ref, gate_ref, lns_ref, lnb_ref,
                                 wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                                 w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                                 dx_ref, u_ref, dpre_ref, a_ref,
                                 *, t: int, heads: int, scale: float,
                                 skip: bool, has_gate: bool, n: int):
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _adapter_fwd_parts, _tanh_gelu_grad,
    )
    tt, tile, d = x_ref.shape
    hd = d // heads
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    g = _sanitize_block(g_ref[...].reshape(t * tile, d), tile, n or tile)
    dt = x0.dtype
    rows = t * tile

    # recompute forward: LN -> q,k,v -> grouped cores -> o -> u
    x32 = x0.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mean) * rstd
    lns = lns_ref[...].astype(jnp.float32)
    y = (xhat * lns + lnb_ref[...].astype(jnp.float32)).astype(dt)
    w = wqkv_ref[...]
    bq = bqkv_ref[...]
    q = (jnp.dot(y, w[:, :d], preferred_element_type=jnp.float32)
         + bq[:d].astype(jnp.float32)).astype(dt)
    k = (jnp.dot(y, w[:, d:2 * d], preferred_element_type=jnp.float32)
         + bq[d:2 * d].astype(jnp.float32)).astype(dt)
    v = (jnp.dot(y, w[:, 2 * d:], preferred_element_type=jnp.float32)
         + bq[2 * d:].astype(jnp.float32)).astype(dt)
    # du depends on u = o Wout + bout, and the core backward needs
    # do = du Wout^T — so the cores run twice: forward-only for o, then
    # the real backward with the adapter-derived cotangent.
    o_fwd = _grouped_core_fwd_dispatch(q, k, v, t, tile, heads, scale, dt,
                                       stacked=False)
    u = (jnp.dot(o_fwd, wout_ref[...], preferred_element_type=jnp.float32)
         + bout_ref[...].astype(jnp.float32))

    pre, a, _ = _adapter_fwd_parts(u.astype(dt), w1_ref, b1_ref, w2_ref,
                                   b2_ref, dt)
    g32 = g.astype(jnp.float32)
    if has_gate:
        i = pl.program_id(0)
        g3 = g32.reshape(t, tile, d)
        # scalar (SMEM) x vector per frame — building a (t,) vector from
        # SMEM scalars does not lower in Mosaic
        db = jnp.concatenate(
            [g3[f] * gate_ref[i, f] for f in range(t)], axis=0)
    else:
        db = g32
    da = jax.lax.dot_general(db.astype(dt), w2_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = da * _tanh_gelu_grad(pre)
    du = jax.lax.dot_general(dpre.astype(dt), w1_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if skip:
        du = du + db

    do = jax.lax.dot_general(du.astype(dt), wout_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    _, dqkv = _grouped_core_bwd_dispatch(q, k, v, do, t, tile, heads, hd,
                                         scale, dt)
    dy = jax.lax.dot_general(dqkv, w, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxhat = dy * lns
    mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
    mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - mdx - xhat * mdxx) + g32

    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(t, tile, d)
    u_ref[...] = u.astype(u_ref.dtype).reshape(t, tile, d)
    dh = dpre.shape[-1]
    dpre_ref[...] = dpre.astype(dpre_ref.dtype).reshape(t, tile, dh)
    a_ref[...] = a.astype(a_ref.dtype).reshape(t, tile, dh)


def fused_temporal_step_bwd_dx(x, gate, ln_scale, ln_bias, w_qkv, b_qkv,
                               w_out, b_out, w1, b1, w2, b2, g,
                               num_frames: int, num_heads: int, skip: bool,
                               tile: Optional[int] = None):
    """Returns (dx, u, dpre, a) for the temporal whole-step backward."""
    bt, n, d = x.shape
    t = num_frames
    requested = tile is not None
    tile = _auto_tile(d, t, tile, n)
    while (not requested and tile > 8
           and (10 * t * tile * d * 2 + 4 * d * d * 2) > 14 * 2 ** 20):
        tile = max(8, tile // 2)
    b = _split_frames(bt, t)
    dh = w1.shape[1]
    scale = 1.0 / ((d // num_heads) ** 0.5)
    has_gate = gate is not None
    gate_in = (_smem_gate(gate.reshape(b, t).astype(jnp.float32)) if has_gate
               else jnp.zeros((1, 1), jnp.float32))
    kernel = functools.partial(_kernel_temporal_step_bwd_dx, t=t,
                               heads=num_heads, scale=scale, skip=skip,
                               has_gate=has_gate, n=n)
    n_cells = pl.cdiv(n, tile)
    blk = lambda w_: pl.BlockSpec((t, tile, w_), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),    # dx
            jax.ShapeDtypeStruct((bt, n, d), x.dtype),    # u
            jax.ShapeDtypeStruct((bt, n, dh), x.dtype),   # dpre
            jax.ShapeDtypeStruct((bt, n, dh), x.dtype),   # a
        ),
        grid=(b, n_cells),
        in_specs=[blk(d), gate_spec, vec, vec,
                  pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3 * d,), lambda i, j: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, d), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec,
                  pl.BlockSpec((d, dh), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dh,), lambda i, j: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dh, d), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec, blk(d)],
        out_specs=(blk(d), blk(d), blk(dh), blk(dh)),
        compiler_params=_cparams("parallel", "parallel"),
    )(x, gate_in, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
      w1, b1, w2, b2, g)


def _kernel_ln_adapter_res_gated(x_ref, gate_ref, lns_ref, lnb_ref,
                                 wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                                 seg_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                                 o_ref, u_ref=None, *, t: int, heads: int,
                                 scale: float, adapter_skip: bool,
                                 n: int = 0):
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _kernel_layernorm, _adapter_epilogue,
    )
    tt, tile, d = x_ref.shape
    x0 = _sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    xn = _kernel_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    y = _temporal_body(xn, wqkv_ref, bqkv_ref, wout_ref, bout_ref, seg_ref,
                       t, heads, scale, stacked=False)
    if u_ref is not None:
        # emit the pre-adapter attention output u: the long-clip (T >
        # STEP_BWD_MAX_T) composition backward consumes it from the VJP
        # residuals instead of re-running a full forward kernel per layer
        u_ref[...] = y.astype(u_ref.dtype).reshape(t, tile, d)
    y = _adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, adapter_skip,
                          x_ref.dtype)
    i = pl.program_id(0)
    y3 = y.reshape(t, tile, d)
    if t * tile * d * 4 <= 2 * 2 ** 20:
        # single stacked store (the T<=16 cells): small fp32 transient;
        # keeps the measured-fast short-clip cell byte-identical to its
        # pre-T=32 form (the per-frame loop exists only for T=32 VMEM)
        x3 = x0.astype(jnp.float32).reshape(t, tile, d)
        out = jnp.stack([x3[f] + y3[f] * gate_ref[i, f] for f in range(t)],
                        axis=0)
        o_ref[...] = out.astype(o_ref.dtype)
    else:
        # per-frame stores: a stacked (t, tile, d) fp32 transient blows the
        # 16M VMEM scope at T=32 (measured 29.2M)
        x3 = x0.reshape(t, tile, d)
        for f in range(t):
            o_ref[f] = (x3[f].astype(jnp.float32)
                        + y3[f] * gate_ref[i, f]).astype(o_ref.dtype)


def fused_ln_temporal_adapter_residual_gated(x, gate, ln_scale, ln_bias,
                                             w_qkv, b_qkv, w_out, b_out,
                                             w1, b1, w2, b2,
                                             num_frames: int,
                                             num_heads: int,
                                             adapter_skip: bool,
                                             tile: Optional[int] = None,
                                             emit_u: bool = False):
    bt, n, d = x.shape
    requested = tile is not None
    tile = _auto_tile(d, num_frames, tile, n)
    t = num_frames
    # the gated step kernel carries extra fp32 transients; shrink the tile
    # beyond the eval budget (T=32 otherwise exceeds the VMEM scope); the
    # emit_u variant adds one more double-buffered (t, tile, d) output row
    while (not requested and tile > 8
           and ((9 if emit_u else 8) * t * tile * d * 2
                + 4 * d * d * 2) > 12 * 2 ** 20):
        tile = max(8, tile // 2)
    b = _split_frames(bt, t)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    seg = _segment_matrix(d, num_heads)
    dh = w1.shape[1]
    kernel = functools.partial(_kernel_ln_adapter_res_gated, t=t,
                               heads=num_heads, scale=scale,
                               adapter_skip=adapter_skip, n=n)
    n_cells = pl.cdiv(n, tile)
    blk = pl.BlockSpec((t, tile, d), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bt, n, d), x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape) if emit_u else out_shape,
        grid=(b, n_cells),
        in_specs=[blk,
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  vec, vec,
                  pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3 * d,), lambda i, j: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, d), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec,
                  pl.BlockSpec((d, num_heads), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, dh), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dh,), lambda i, j: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dh, d), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec],
        out_specs=(blk, blk) if emit_u else blk,
        compiler_params=_cparams("parallel", "parallel"),
    )(x, _smem_gate(gate.reshape(b, t).astype(jnp.float32)), ln_scale, ln_bias,
      w_qkv, b_qkv, w_out, b_out, seg, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_temporal_train_step(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                              b_out, w1, b1, w2, b2, gate, num_frames,
                              num_heads, skip):
    """TRAIN whole-step op: ``x + gate * T_Adapter(attn_T(LN(x)))`` with
    in-kernel forward AND backward (exact adapter dW; frozen attn/LN zeros;
    gate per sample-frame (B*T,) or None)."""
    if gate is None:
        return fused_ln_temporal_adapter_residual(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
            w1, b1, w2, b2, num_frames, num_heads, skip)
    return fused_ln_temporal_adapter_residual_gated(
        x, gate, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
        w1, b1, w2, b2, num_frames, num_heads, skip)


def _fwd_tstep(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, w1, b1,
               w2, b2, gate, num_frames, num_heads, skip):
    if not _tstep_whole_cell_fits(num_frames, x.shape[-1]):
        # long clips (T > 16) or wide models (d > 768): emit the
        # pre-adapter u alongside the output and stash it — the
        # composition backward then skips a full per-layer forward
        # kernel (u recompute), cutting the temporal kernel passes per
        # train step from 3 to 2. gate=None rides as an all-ones gate
        # (exact: the gated store multiplies by 1.0).
        gate_eff = (gate if gate is not None
                    else jnp.ones((x.shape[0],), jnp.float32))
        y, u = fused_ln_temporal_adapter_residual_gated(
            x, gate_eff, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
            w1, b1, w2, b2, num_frames, num_heads, skip, emit_u=True)
        return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                   w1, b1, w2, b2, gate, u)
    y = fused_temporal_train_step(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                  w_out, b_out, w1, b1, w2, b2, gate,
                                  num_frames, num_heads, skip)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
               w1, b1, w2, b2, gate, None)


def _bwd_tstep(num_frames, num_heads, skip, res, g):
    (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
     w1, b1, w2, b2, gate, u) = res
    if not _tstep_whole_cell_fits(num_frames, x.shape[-1]):
        # long clips (T=32: 17.7M at tile=8) or wide models (d=1024:
        # 23.1M): the whole-step backward cell exceeds the VMEM scope —
        # use the two-kernel composition: u comes from the forward's
        # emit_u stash (no recompute pass), adapter backward in XLA
        # (exact), dX via the dX-only backward kernel (core dispatched
        # like the forward)
        from adapt_image_models_tpu.ops.fused_qkv_attention import (
            _adapter_bwd_xla, _adapter_weight_cotangents, _gated_cotangent,
        )
        g32 = g.astype(jnp.float32)
        db = _gated_cotangent(g32, gate)
        dpre, a, du = _adapter_bwd_xla(u.astype(jnp.float32), db,
                                       w1, b1, w2, skip)
        dx_kernel = (fused_ln_temporal_attention_bwd_dx
                     if _use_full_core(num_frames)
                     else fused_ln_temporal_attention_bwd_dx_segment)
        dx = dx_kernel(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, du.astype(x.dtype),
            num_frames, num_heads) + g.astype(x.dtype)
        dw1, db1, dw2, db2, dgate = _adapter_weight_cotangents(
            u, dpre, a, g32, db, gate, skip, w1, b1, w2, b2)
        z_ = jnp.zeros_like
        return (dx, z_(ln_scale), z_(ln_bias), z_(w_qkv), z_(b_qkv),
                z_(w_out), z_(b_out), dw1, db1, dw2, db2, dgate)
    dx, u, dpre, a = fused_temporal_step_bwd_dx(
        x, gate, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
        w1, b1, w2, b2, g.astype(x.dtype), num_frames, num_heads, skip)
    from adapt_image_models_tpu.ops.fused_qkv_attention import (
        _adapter_weight_cotangents, _gated_cotangent,
    )
    g32 = g.astype(jnp.float32)
    db = _gated_cotangent(g32, gate)
    dw1, db1, dw2, db2, dgate = _adapter_weight_cotangents(
        u, dpre, a, g32, db, gate, skip, w1, b1, w2, b2)
    z_ = jnp.zeros_like
    return (dx, z_(ln_scale), z_(ln_bias), z_(w_qkv), z_(b_qkv), z_(w_out),
            z_(b_out), dw1, db1, dw2, db2, dgate)


fused_temporal_train_step.defvjp(_fwd_tstep, _bwd_tstep)
