"""Fully-fused attention: (optional fp32 LayerNorm) -> QKV projection ->
per-head softmax(QK^T)V -> output projection, in ONE Pallas kernel.

Motivation (measured on v5e, ViT-B shapes, batch 32): the XLA spatial
attention path runs at ~39 TFLOP/s while the plain MLP hits ~186 TFLOP/s —
the gap is HBM round-trips between the projection matmuls and the
(transposed, small-head) attention core. Keeping q/k/v, scores and the
attention output entirely in VMEM per sample removes that traffic:
projection matmuls are large (N_pad x D x 3D) and MXU-friendly, and the
per-head cores consume VMEM-resident tiles.

Round-2 upgrades (profiled on the real chip, BENCH r1 -> r2):
* token padding shrank from the next 128-multiple to the next 16-multiple
  (bf16 sublane granularity): ViT-B runs 197 -> 208 tokens instead of 256,
  cutting ~19% of projection FLOPs;
* ``l_actual`` decouples the mask length from the input length so the
  backbone can pad ONCE and carry N_pad tokens through every layer
  (pad-through-network) instead of pad/slice per ``pallas_call``;
* the pre-attention fp32 LayerNorm optionally fuses into the kernel
  prologue (``ln_scale``/``ln_bias``), removing one full HBM round-trip of
  the activation tensor per attention.

Weight tensors use constant index maps, so Mosaic's pipeline loads them
into VMEM once and reuses them across all grid cells.

VMEM budget per cell (ViT-B: N_pad=208, D=768, bf16):
  Wqkv 3.5M + Wout 1.2M + x 0.3M + qkv 1.0M + scores(fp32) 0.17M + out 0.3M
  ~= 6.5 MB < the 16 MB scoped limit. ViT-L (N_pad=272, D=1024) ~= 11 MB.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Per-kernel scoped-VMEM limit. Mosaic's default assert is 16M, but a v5e
# core has 128M physical VMEM and our kernels run exclusively — the
# rounds-3/4 "VMEM ceiling" cells (ViT-L dX at 16.01M, ViT-L whole-step
# backward at 21-23M, T=32 cells at 17-29M) all fit the hardware. Raising
# the limit makes the real ceiling physical VMEM; the dispatch gates that
# pick between one-kernel and composition paths remain PERF decisions,
# re-calibrated on-chip (see docs/benchmark.md round 4).
_VMEM_LIMIT = int(os.environ.get("AIM_KERNEL_VMEM_LIMIT",
                                 str(100 * 2 ** 20)))


def _cparams(*dimension_semantics: str) -> "pltpu.CompilerParams":
    return pltpu.CompilerParams(dimension_semantics=dimension_semantics,
                                vmem_limit_bytes=_VMEM_LIMIT)


# LN moment-reduction strategy inside the kernels. 'vpu' (default) reduces
# across lanes on the VPU; 'mxu' computes mean/E[x^2] via (D, 8) ones-
# matmuls on the MXU — same math, different reduction order (uncentered
# variance, fp32 throughout; diffs are ~1 ulp at activation scales). The
# in-kernel knockout sweep (tools/analysis/knockout_spatial_kernel.py,
# 'fastln') stages the on-chip A/B; flip AIM_KERNEL_LN=mxu to productionize
# if it measures a win. Read once at import: kernels are traced under jit.
_LN_MODE = os.environ.get("AIM_KERNEL_LN", "vpu")

# Eval-cell softmax layout: 'stacked' (default, heads concatenated so
# mask/max/exp/sum run as few large VPU ops) or 't' (transposed scores,
# sublane-direction reductions — the knockout 'softmax_t' candidate;
# measured r4: compile hangs on the relay, documented negative result).
# Read once at import; eval cells only (train cells keep exact per-head
# chains, see _attention_body).
_SOFTMAX_MODE = os.environ.get("AIM_EVAL_SOFTMAX", "stacked")

# Eval-cell softmax arithmetic (stacked paths only; train cells stay
# byte-identical): exp2 with log2(e) folded into the q prescale — jnp.exp
# lowers as exp2(x * 1.4427), so pre-folding kills one full VPU multiply
# pass over every (stacked_rows, L) score matrix — and a per-row
# reciprocal-multiply replacing the (rows, hd) broadcast DIVIDE after AV
# (VPU divides cost several times a multiply). Same math to ~1 ulp.
# MEASURED r4 (v5e batch-512 full model): 355.1 with vs 355.1 without —
# perf-NEUTRAL, so the default stays off (documented negative result: the
# cells are not VPU-softmax-bound; Mosaic already folds the exp multiply).
# AIM_FAST_SOFTMAX=1 enables for A/B on other geometries.
_FAST_SOFTMAX = os.environ.get("AIM_FAST_SOFTMAX", "0") != "0"
_LOG2E = 1.4426950408889634


def _kernel_layernorm(x, scale_ref, bias_ref, dtype, eps: float = 1e-5):
    """fp32 LayerNorm in VMEM (matches models.layers.LayerNormFP32)."""
    x32 = x.astype(jnp.float32)
    if _LN_MODE == "mxu":
        d = x.shape[-1]
        ones = jnp.full((d, 8), 1.0 / d, jnp.float32)
        mean = jnp.dot(x32, ones, preferred_element_type=jnp.float32)[:, :1]
        meansq = jnp.dot(jnp.square(x32), ones,
                         preferred_element_type=jnp.float32)[:, :1]
        # uncentered variance can dip negative from fp32 cancellation on
        # near-constant rows; clamp before rsqrt
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    else:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    return y.astype(dtype)


def _adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, skip: bool,
                      dtype):
    """Bottleneck-adapter epilogue in VMEM: fc1 -> gelu -> fc2 (+skip).

    Uses tanh-gelu: exact erf does not lower in Mosaic; max deviation vs the
    erf form is ~5e-4 — below bf16 resolution at these activations."""
    a = jnp.dot(y.astype(dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    a = jax.nn.gelu(a + b1_ref[...].astype(jnp.float32), approximate=True)
    z = jnp.dot(a.astype(dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    z = z + b2_ref[...].astype(jnp.float32)
    return y + z if skip else z


def _project_qkv(x, wqkv_ref, bqkv_ref):
    """Per-projection matmuls (a single packed (L,3D) fp32 intermediate
    blows the VMEM budget at ViT-L widths)."""
    d = x.shape[-1]
    w = wqkv_ref[...]
    b = bqkv_ref[...]
    outs = []
    for i in range(3):
        y = jnp.dot(x, w[:, i * d:(i + 1) * d],
                    preferred_element_type=jnp.float32)
        outs.append((y + b[i * d:(i + 1) * d].astype(jnp.float32))
                    .astype(x.dtype))
    return jnp.concatenate(outs, axis=1)


def _key_mask_strip(lp: int, l_actual: int):
    """(1, lp) additive key-padding mask strip (broadcasts over any row
    count), or None when every key is real. The strip replaces full
    (lp, lp) masks in the kernels: same math under broadcasting, ~lp x
    less VMEM — the ViT-L dX backward cell exceeded the 16M scope by 8 KB
    with full masks."""
    if l_actual >= lp:
        return None
    col = jax.lax.broadcasted_iota(jnp.int32, (8, lp), 1)
    return jnp.where(col < l_actual, jnp.float32(0.0),
                     jnp.float32(MASK_VALUE))[:1]


def _sanitize_rows(x, l_actual: int):
    """Zero rows beyond ``l_actual``: a partial block's out-of-range reads
    are undefined (NaN in interpret mode) and would otherwise poison the
    softmax through key columns / value rows."""
    lp = x.shape[0]
    if l_actual >= lp:
        return x
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < l_actual, x, jnp.zeros_like(x))


def _is_pow2(x: float) -> bool:
    from math import frexp
    m, _ = frexp(x)
    return m == 0.5


def _smem_gate(gate2d: jax.Array) -> jax.Array:
    """Pad a 2-D SMEM gate array's leading dim to >= 8 rows.

    Defensive hardening from the round-5 batch-4 kernel-fault bisect
    (PARITY.md): small micro-batches are the only place the drop-path
    gate arrays drop below the fp32 sublane count ((4, 8) at batch 4 vs
    (32, 8)+ in every benchmarked config), and batch 4 reproducibly
    killed the v5e worker. The confirmed trigger was the joint rows
    kernels' partial row tile (see ops/fused_joint_mlp.py), but sub-8-row
    SMEM windows are kept padded too — batch 4 is a legal micro-batch
    (reference ``apis/train.py:53`` divides ``videos_per_gpu`` by
    ``update_interval``) and the padding is inert (kernels only index
    rows < b)."""
    b = gate2d.shape[0]
    if b >= 8:
        return gate2d
    return jnp.pad(gate2d, ((0, 8 - b), (0, 0)))


# Stacked-head softmax transient cap: heads are processed in chunks whose
# concatenated score matrix stays <= ~2496 rows (ViT-B: all 12 heads in one
# chunk, 2.1 MB fp32; ViT-L lp=272 would stack 4.7 MB -> chunked). Measured
# v5e (batch 512, full model): per-head softmax chains -> stacked = +7
# clips/s combined with the temporal core's stacking (346.4 -> 353.3).
# AIM_STACK_ROWS stages the chunk-size A/B (smaller chunks let Mosaic
# overlap chunk i+1's MXU score matmuls with chunk i's VPU softmax; one
# chunk serializes MXU -> VPU -> MXU within the cell). Measured r4 on v5e
# (batch-512 full model, tools/analysis/sweep_softmax_layout.py): 6-head
# chunks (1248 rows at ViT-B's lp=208) are a consistent small win —
# 357.1-357.6 vs 355.0-355.5 clips/s across three runs — so 1248 is the
# default; 2496 restores the round-3 all-heads stacking.
_STACK_ROWS = int(os.environ.get("AIM_STACK_ROWS", "1248"))


def _attention_body(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                    heads: int, l_actual: int, scale: float,
                    stacked: bool = True):
    """Post-LN tokens (L_pad, D) -> attention block output (L_pad, D) fp32.

    When ``stacked`` (eval kernels), the per-head softmax runs STACKED:
    all chunk heads' score matrices are concatenated so max/exp/sum execute
    as few large VPU ops instead of ``heads`` small serial chains. Train
    kernels pass ``stacked=False``: their cells carry adapter/gate
    transients on top of the attention ones, and the stacked fp32 score
    block measurably slows the step there (v5e ViT-B 8f b32: 98.5 -> 92.4
    clips/s) — per-head chains keep the peak working set minimal. The
    1/sqrt(hd) scale folds into q before the score matmul when it is a
    power of two (hd=64 everywhere in CLIP: exact in bf16, 2x fewer scaled
    elements); otherwise it scales scores.
    """
    lp, d = x.shape
    hd = d // heads
    x = _sanitize_rows(x, l_actual)
    qkv = _project_qkv(x, wqkv_ref, bqkv_ref)  # (L_pad, 3D) bf16

    if not stacked:
        # train cells: EXACT original per-head chain (scale+mask fused into
        # one multiply-add per head, no prescaled q copy). The stacked
        # restructure measurably slows the whole-step train kernels
        # (v5e ViT-B 8f b32: 98.5 -> ~92 clips/s) — their cells are
        # VMEM-pressure-bound, not VPU-serialization-bound. The mask is a
        # 1-row broadcast strip, not (lp, lp): same math, ~lp x less VMEM
        # (the ViT-L dX cell sat 8 KB past the 16M scope with full masks).
        keymask = _key_mask_strip(lp, l_actual)
        outs = []
        for h in range(heads):
            q = qkv[:, h * hd:(h + 1) * hd]
            k = qkv[:, d + h * hd:d + (h + 1) * hd]
            v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + keymask if keymask is not None else s * scale
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            o_h = jax.lax.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32) / denom
            outs.append(o_h.astype(x.dtype))
        out = jnp.concatenate(outs, axis=1)
        y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
        return y + bout_ref[...].astype(jnp.float32)

    # fast-softmax folds log2(e) into the prescale (exp2 path) — the scaled
    # q is no longer exactly representable in bf16, but the product
    # scale * log2e perturbs q by <1 ulp of bf16 vs the exact-pow2 scale;
    # measured parity stays within the kernels' tolerances
    prescale = _is_pow2(scale)
    q_all = qkv[:, :d]
    if _FAST_SOFTMAX and _SOFTMAX_MODE != "t":
        prescale = True
        q_all = (q_all.astype(jnp.float32) * (scale * _LOG2E)).astype(
            qkv.dtype)
    elif prescale:
        q_all = (q_all.astype(jnp.float32) * scale).astype(qkv.dtype)

    if _SOFTMAX_MODE == "t":
        # TRANSPOSED scores (knockout 'softmax_t' candidate): S_T
        # (keys, queries) = K @ Q^T so the softmax max/sum reduce over
        # SUBLANES (the fast VPU direction) instead of lanes, and AV
        # contracts P_T's sublane dim directly. Flip AIM_EVAL_SOFTMAX=t to
        # productionize if the on-chip A/B measures a win.
        keymask_t = None
        if l_actual < lp:
            row = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
            keymask_t = jnp.where(row < l_actual, jnp.float32(0.0),
                                  jnp.float32(MASK_VALUE))
        outs = []
        for h in range(heads):
            q = q_all[:, h * hd:(h + 1) * hd]
            k = qkv[:, d + h * hd:d + (h + 1) * hd]
            v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if not prescale:
                st = st * scale
            if keymask_t is not None:
                st = st + keymask_t
            m = jnp.max(st, axis=0, keepdims=True)
            p = jnp.exp(st - m)
            denom = jnp.sum(p, axis=0, keepdims=True)
            o_h = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) \
                / denom.reshape(-1, 1)
            outs.append(o_h.astype(x.dtype))
        out = jnp.concatenate(outs, axis=1)
        y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
        return y + bout_ref[...].astype(jnp.float32)

    # key-padding mask depends only on the column -> one (8, lp) strip
    # broadcast-adds over any chunk's stacked rows (computed once, outside
    # the head loop; 8 sublanes is the fp32 tile minimum)
    keymask = None
    if l_actual < lp:
        col = jax.lax.broadcasted_iota(jnp.int32, (8, lp), 1)
        keymask = jnp.where(col < l_actual, jnp.float32(0.0),
                            jnp.float32(MASK_VALUE))[:1]

    chunk = max(1, min(heads, _STACK_ROWS // lp))
    outs = []
    for h0 in range(0, heads, chunk):
        hc = min(chunk, heads - h0)
        ss = []
        for h in range(h0, h0 + hc):
            q = q_all[:, h * hd:(h + 1) * hd]
            k = qkv[:, d + h * hd:d + (h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            ss.append(s)
        S = ss[0] if hc == 1 else jnp.concatenate(ss, axis=0)
        if not prescale:
            S = S * scale
        if keymask is not None:
            S = S + keymask
        m = jnp.max(S, axis=1, keepdims=True)
        p = jnp.exp2(S - m) if _FAST_SOFTMAX else jnp.exp(S - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        inv = 1.0 / denom if _FAST_SOFTMAX else None
        pb = p.astype(qkv.dtype)
        for i, h in enumerate(range(h0, h0 + hc)):
            v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            o_h = jax.lax.dot(pb[i * lp:(i + 1) * lp], v,
                              preferred_element_type=jnp.float32)
            o_h = (o_h * inv[i * lp:(i + 1) * lp] if _FAST_SOFTMAX
                   else o_h / denom[i * lp:(i + 1) * lp])
            outs.append(o_h.astype(x.dtype))
    out = jnp.concatenate(outs, axis=1)  # (L_pad, D), static head offsets

    y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
    return y + bout_ref[...].astype(jnp.float32)


def _kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, o_ref,
            *, heads: int, l_actual: int, scale: float):
    y = _attention_body(x_ref[0], wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                        heads, l_actual, scale)
    o_ref[0] = y.astype(o_ref.dtype)


def _kernel_ln(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
               bout_ref, o_ref, *, heads: int, l_actual: int, scale: float):
    """LN prologue fused: reads the RAW residual stream."""
    x = _sanitize_rows(x_ref[0], l_actual)
    x = _kernel_layernorm(x, lns_ref, lnb_ref, x_ref.dtype)
    y = _attention_body(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                        heads, l_actual, scale)
    o_ref[0] = y.astype(o_ref.dtype)


def _kernel_adapter(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                    *, heads: int, l_actual: int, scale: float, skip: bool):
    """Same as ``_kernel`` plus the S_Adapter epilogue fused in."""
    x = x_ref[0]
    y = _attention_body(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                        heads, l_actual, scale)
    y = _adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, skip, x.dtype)
    o_ref[0] = y.astype(o_ref.dtype)


def _kernel_ln_adapter_res(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                           wout_ref, bout_ref, w1_ref, b1_ref, w2_ref,
                           b2_ref, o_ref, *, heads: int, l_actual: int,
                           scale: float, skip: bool):
    """Whole eval-mode adaptation step in one kernel:
    ``x + Adapter(attn(LN(x)))`` — LN prologue, attention, bottleneck
    adapter epilogue and the residual add, zero intermediate HBM traffic."""
    x0 = _sanitize_rows(x_ref[0], l_actual)
    xn = _kernel_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    y = _attention_body(xn, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                        heads, l_actual, scale)
    y = _adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, skip,
                          x_ref.dtype)
    o_ref[0] = (x0.astype(jnp.float32) + y).astype(o_ref.dtype)


_WEIGHT_SPECS = lambda d: [
    pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
    pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
]


def _call_spatial(kernel, xp, weights, lp, d, b, num_heads, extra_specs=(),
                  extra_args=()):
    """The block is (1, lp, d) with lp = round_up(L, 16) over the UNPADDED
    (B, L, D) array: Pallas masks the partial block's read/write, so no
    pad/slice ops ever materialize in HBM. Padded-key columns are masked by
    ``l_actual``; padded-query rows are garbage that the masked store drops.
    """
    l = xp.shape[1]
    x_spec = pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), xp.dtype),
        grid=(b,),
        in_specs=[x_spec, *extra_specs, *_WEIGHT_SPECS(d)],
        out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams("parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (lp * d * 3 * d + 2 * lp * lp * d + lp * d * d),
            bytes_accessed=2 * (b * lp * d * 2 + d * 3 * d + d * d),
            transcendentals=b * num_heads * lp * lp,
        ),
    )(xp, *extra_args, *weights)


def fused_qkv_attention(x: jax.Array, w_qkv: jax.Array, b_qkv: jax.Array,
                        w_out: jax.Array, b_out: jax.Array,
                        num_heads: int,
                        l_actual: Optional[int] = None) -> jax.Array:
    """x: (B, L, D) post-LN tokens -> (B, L, D) attention block output.

    ``l_actual``: number of REAL tokens (keys beyond it are masked). Defaults
    to L — pass it when the caller carries padded tokens through the network.
    """
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)

    kernel = functools.partial(_kernel, heads=num_heads, l_actual=l_actual,
                               scale=scale)
    return _call_spatial(kernel, x, (w_qkv, b_qkv, w_out, b_out),
                         lp, d, b, num_heads)


def fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                           num_heads: int,
                           l_actual: Optional[int] = None) -> jax.Array:
    """Raw residual stream in, ``out_proj(attn(LN(x)))`` out — the fp32 LN
    runs inside the kernel, saving one HBM round-trip of x per attention."""
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)

    kernel = functools.partial(_kernel_ln, heads=num_heads, l_actual=l_actual,
                               scale=scale)
    ln_specs = [
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    return _call_spatial(kernel, x, (w_qkv, b_qkv, w_out, b_out),
                         lp, d, b, num_heads, extra_specs=ln_specs,
                         extra_args=(ln_scale, ln_bias))


def fused_qkv_attention_adapter(x, w_qkv, b_qkv, w_out, b_out,
                                w1, b1, w2, b2, num_heads: int,
                                skip: bool,
                                l_actual: Optional[int] = None) -> jax.Array:
    """Attention block + fused bottleneck-adapter epilogue."""
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    dh = w1.shape[1]
    kernel = functools.partial(_kernel_adapter, heads=num_heads,
                               l_actual=l_actual, scale=scale, skip=skip)
    adapter_specs = [
        pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    x_spec = pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        grid=(b,),
        in_specs=[x_spec, *_WEIGHT_SPECS(d), *adapter_specs],
        out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams("parallel"),
    )(x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2)


# ---------------------------------------------------------------------------
# XLA reference implementations (used for the rematerialized backward AND by
# the interpret-mode correctness tests)


def _key_mask(l, l_actual):
    if l_actual is None or l_actual >= l:
        return None
    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    return jnp.where(col < l_actual, jnp.float32(0.0),
                     jnp.float32(MASK_VALUE))


def _ref_impl(x, w_qkv, b_qkv, w_out, b_out, num_heads, l_actual=None):
    """XLA reference for the backward (rematerialized)."""
    b, l, d = x.shape
    hd = d // num_heads
    qkv = x @ w_qkv.astype(x.dtype) + b_qkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, num_heads, hd)
    k = k.reshape(b, l, num_heads, hd)
    v = v.reshape(b, l, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    mask = _key_mask(l, l_actual)
    if mask is not None:
        logits = logits + mask
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(b, l, d)
    return o @ w_out.astype(x.dtype) + b_out.astype(x.dtype)


def _ref_ln_impl(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                 num_heads, l_actual=None):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y = (y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    return _ref_impl(y.astype(x.dtype), w_qkv, b_qkv, w_out, b_out,
                     num_heads, l_actual)


def _ref_adapter_impl(x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
                      num_heads, skip, l_actual=None):
    y = _ref_impl(x, w_qkv, b_qkv, w_out, b_out, num_heads, l_actual)
    a = jax.nn.gelu(y.astype(jnp.float32) @ w1.astype(jnp.float32)
                    + b1.astype(jnp.float32), approximate=True)  # tanh-gelu: matches the kernels
    z = (a @ w2.astype(jnp.float32) + b2.astype(jnp.float32)).astype(y.dtype)
    return y + z if skip else z


# ---------------------------------------------------------------------------
# custom-VJP entry points (forward = Pallas kernel, backward = rematerialized
# XLA reference)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_attention_adapter_block(x, w_qkv, b_qkv, w_out, b_out,
                                  w1, b1, w2, b2, num_heads, skip,
                                  l_actual=None):
    return fused_qkv_attention_adapter(x, w_qkv, b_qkv, w_out, b_out,
                                       w1, b1, w2, b2, num_heads, skip,
                                       l_actual)


def _fwd_ad(x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2, num_heads, skip,
            l_actual):
    y = fused_qkv_attention_adapter(x, w_qkv, b_qkv, w_out, b_out,
                                    w1, b1, w2, b2, num_heads, skip, l_actual)
    return y, (x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2)


def _bwd_ad(num_heads, skip, l_actual, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_adapter_impl(*a, num_heads, skip,
                                                  l_actual), *res)
    return vjp(g)


fused_attention_adapter_block.defvjp(_fwd_ad, _bwd_ad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention_block(x, w_qkv, b_qkv, w_out, b_out, num_heads,
                          l_actual=None):
    return fused_qkv_attention(x, w_qkv, b_qkv, w_out, b_out, num_heads,
                               l_actual)


def _fwd(x, w_qkv, b_qkv, w_out, b_out, num_heads, l_actual):
    return fused_qkv_attention(x, w_qkv, b_qkv, w_out, b_out, num_heads,
                               l_actual), \
        (x, w_qkv, b_qkv, w_out, b_out)


def _bwd(num_heads, l_actual, res, g):
    x, w_qkv, b_qkv, w_out, b_out = res
    _, vjp = jax.vjp(lambda *a: _ref_impl(*a, num_heads, l_actual), x, w_qkv,
                     b_qkv, w_out, b_out)
    return vjp(g)


fused_attention_block.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, num_heads, l_actual=None):
    return fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                                  b_out, num_heads, l_actual)


def _fwd_ln(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, num_heads,
            l_actual):
    y = fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                               b_out, num_heads, l_actual)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)


def _bwd_ln(num_heads, l_actual, res, g):
    """XLA-remat backward (kept as the correctness oracle for the Pallas
    backward kernel, _bwd_ln_pallas below — the registered default)."""
    _, vjp = jax.vjp(lambda *a: _ref_ln_impl(*a, num_heads, l_actual), *res)
    return vjp(g)


def _bwd_vmem_fits(l: int, d: int) -> bool:
    """Per-cell VMEM estimate for the backward kernel: 9 row blocks
    (x, g, dx, dqkv x3, dy, y, o) double-buffered + resident weights.
    ViT-B (208, 768) ~ 10.5M fits; ViT-L (272, 1024) ~ 18.4M does not —
    those widths keep the XLA-remat backward."""
    lp = _round_up(l, 16)
    # 18 double-buffered row-block units + (3d^2 + d^2) weight ELEMENTS x 2B
    est = 18 * lp * d * 2 + 4 * d * d * 2
    return est <= 14 * 2 ** 20


def _bwd_ln_dispatch(num_heads, l_actual, res, g):
    x = res[0]
    if _bwd_vmem_fits(x.shape[1], x.shape[2]):
        return _bwd_ln_pallas(num_heads, l_actual, res, g)
    return _bwd_ln(num_heads, l_actual, res, g)


fused_ln_attention_block.defvjp(_fwd_ln, _bwd_ln_dispatch)


def fused_ln_attn_adapter_residual(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                   w_out, b_out, w1, b1, w2, b2,
                                   num_heads: int, skip: bool,
                                   l_actual: Optional[int] = None):
    """Raw residual stream -> ``x + Adapter(attn(LN(x)))`` in one kernel
    (the whole spatial-adaptation step of an AIM block, eval mode)."""
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    dh = w1.shape[1]
    kernel = functools.partial(_kernel_ln_adapter_res, heads=num_heads,
                               l_actual=l_actual, scale=scale, skip=skip)
    ln_specs = [
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    adapter_specs = [
        pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    x_spec = pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        grid=(b,),
        in_specs=[x_spec, *ln_specs, *_WEIGHT_SPECS(d), *adapter_specs],
        out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams("parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (lp * d * 3 * d + 2 * lp * lp * d + lp * d * d),
            bytes_accessed=2 * (b * lp * d * 2 + d * 3 * d + d * d),
            transcendentals=b * num_heads * lp * lp,
        ),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2)


def _ref_ln_adapter_res_impl(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, w1, b1, w2, b2, num_heads, skip,
                             l_actual=None):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xn = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    y = _ref_impl(xn, w_qkv, b_qkv, w_out, b_out, num_heads, l_actual)
    a = jax.nn.gelu(y.astype(jnp.float32) @ w1.astype(jnp.float32)
                    + b1.astype(jnp.float32), approximate=True)  # tanh-gelu: matches the kernels
    z = a @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    z = y32 + z if skip else z
    return (x.astype(jnp.float32) + z).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_spatial_step_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, w1, b1, w2, b2, num_heads, skip,
                             l_actual=None):
    return fused_ln_attn_adapter_residual(x, ln_scale, ln_bias, w_qkv,
                                          b_qkv, w_out, b_out, w1, b1, w2,
                                          b2, num_heads, skip, l_actual)


def _fwd_step(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, w1, b1, w2,
              b2, num_heads, skip, l_actual):
    y = fused_ln_attn_adapter_residual(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                       w_out, b_out, w1, b1, w2, b2,
                                       num_heads, skip, l_actual)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
               w1, b1, w2, b2)


def _bwd_step(num_heads, skip, l_actual, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_ln_adapter_res_impl(
        *a, num_heads, skip, l_actual), *res)
    return vjp(g)


fused_spatial_step_block.defvjp(_fwd_step, _bwd_step)


# ---------------------------------------------------------------------------
# Pallas BACKWARD kernel for the LN+attention block (the hot train-path op).
#
# The default backward above rematerializes the unfused XLA attention, which
# runs at a fraction of the fused kernel's throughput. This kernel computes
# the expensive part — dX through LN -> QKV -> softmax -> out-proj — at
# kernel speed, and hands the *intermediates* (dqkv, dy, y, o) back to XLA,
# which forms the weight/bias/LN-param cotangents as plain batched matmuls.
# In the AIM regime those weights are frozen, so XLA dead-code-eliminates
# every dW it isn't asked for; when they ARE trained the math stays exact.


def _bwd_ln_attention_body(x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                           wout_ref, g, heads: int, l_actual: int,
                           scale: float, with_ln: bool = True):
    """One sample's backward. Returns (dx, dqkv, dy, y, o) — all (L_pad, ·).

    Notation: x0 raw residual input, y = LN(x0) (or y = x0 when
    ``with_ln=False`` — the plain ``fused_attention_block`` variant),
    qkv = y Wqkv + b, o = attn(qkv), out = o Wout + bout, g = d out.
    """
    lp, d = x0.shape
    hd = d // heads
    dt = x0.dtype

    # --- recompute forward up to the per-head probabilities ---
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
    qkv = _project_qkv(y, wqkv_ref, bqkv_ref)  # (L_pad, 3D) bf16

    keymask = _key_mask_strip(lp, l_actual)  # (1, lp) broadcast or None

    # d o = g Wout^T — in the stream dtype: every consumer slices per head
    # and casts to dt anyway, so a fp32 do is pure VMEM (the ViT-L dX cell
    # sat 8 KB past the 16M scope; this saves lp*d*2B = 0.56M there)
    do = jax.lax.dot_general(g.astype(dt), wout_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(dt)

    o_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + keymask if keymask is not None else s * scale
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)       # (L, L) fp32
        pb = p.astype(dt)
        o_h = jax.lax.dot(pb, v, preferred_element_type=jnp.float32)
        o_parts.append(o_h.astype(dt))

        do_h = do[:, h * hd:(h + 1) * hd].astype(dt)
        # dv = p^T do
        dv = jax.lax.dot_general(pb, do_h, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dp = do v^T ; ds = p * (dp - rowsum(dp*p))
        dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rowdot = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - rowdot)).astype(dt)             # masked cols -> 0
        dq = jax.lax.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_parts.append(dq.astype(dt))
        dk_parts.append(dk.astype(dt))
        dv_parts.append(dv.astype(dt))

    o = jnp.concatenate(o_parts, axis=1)
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_parts, axis=1),
         jnp.concatenate(dk_parts, axis=1),
         jnp.concatenate(dv_parts, axis=1)], axis=1)    # (L, 3D)

    # dy = dqkv Wqkv^T
    dy = jax.lax.dot_general(dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    if with_ln:
        # LN backward (fp32): dxhat = dy * gamma;
        # dx = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))
        dxhat = dy * lns
        mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
        mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = rstd * (dxhat - mdx - xhat * mdxx)
    else:
        dx = dy
    return dx, dqkv, dy, y, o


def _kernel_ln_bwd(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                   g_ref, dx_ref, dqkv_ref, dy_ref, y_ref, o_ref,
                   *, heads: int, l_actual: int, scale: float):
    x0 = _sanitize_rows(x_ref[0], l_actual)
    g = _sanitize_rows(g_ref[0], l_actual)
    dx, dqkv, dy, y, o = _bwd_ln_attention_body(
        x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, g,
        heads, l_actual, scale)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dqkv_ref[0] = dqkv.astype(dqkv_ref.dtype)
    dy_ref[0] = dy.astype(dy_ref.dtype)
    y_ref[0] = y.astype(y_ref.dtype)
    o_ref[0] = o.astype(o_ref.dtype)


def fused_ln_qkv_attention_bwd(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                               g, num_heads: int,
                               l_actual: Optional[int] = None):
    """Pallas backward core: returns (dx, dqkv, dy, y, o).

    dx is the full input cotangent (through the LN); the other outputs let
    the (cheap, DCE-able) weight cotangents be formed by XLA:
      dWqkv = y^T dqkv    dbqkv = sum dqkv
      dWout = o^T g       dbout = sum g
      dgamma = sum dy*xhat  dbeta = sum dy  (xhat recomputed from x)
    """
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)

    kernel = functools.partial(_kernel_ln_bwd, heads=num_heads,
                               l_actual=l_actual, scale=scale)
    row_spec = lambda w: pl.BlockSpec((1, lp, w), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            # dx/dy in the stream dtype: the VJP returns bf16 cotangents
            # anyway, and fp32 outputs push the cell past the 16M VMEM
            # scope at ViT-B batch>=16 (measured: 16.75M)
            jax.ShapeDtypeStruct((b, l, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((b, l, 3 * d), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((b, l, d), x.dtype),       # dy
            jax.ShapeDtypeStruct((b, l, d), x.dtype),       # y
            jax.ShapeDtypeStruct((b, l, d), x.dtype),       # o
        ),
        grid=(b,),
        in_specs=[
            row_spec(d), vec_spec, vec_spec,
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row_spec(d),
        ],
        out_specs=(row_spec(d), row_spec(3 * d), row_spec(d), row_spec(d),
                   row_spec(d)),
        compiler_params=_cparams("parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (2 * lp * d * 3 * d + 6 * lp * lp * d
                           + 2 * lp * d * d),
            bytes_accessed=2 * (5 * b * lp * d * 2 + d * 3 * d + d * d),
            transcendentals=b * num_heads * lp * lp,
        ),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g)


def _attention_weight_cotangents(g, dqkv, y, o, x=None, dy=None,
                                 l_actual=None):
    """XLA weight-cotangent epilogue shared by every attention-block
    backward (spatial + temporal, LN-fused or plain): attention weight/bias
    cotangents from the kernel-emitted intermediates, plus LN parameter
    cotangents when ``dy`` is given (padded rows masked out of xhat via
    ``l_actual`` — only the spatial layout carries padded rows at the XLA
    level). Returns (dwqkv, dbqkv, dwout, dbout[, dgamma, dbeta])."""
    g32 = g.astype(jnp.float32)
    # weight/bias cotangents — plain matmuls, DCE'd when frozen upstream
    dwqkv = jnp.einsum("bld,ble->de", y.astype(jnp.float32),
                       dqkv.astype(jnp.float32))
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))
    dwout = jnp.einsum("bld,ble->de", o.astype(jnp.float32), g32)
    dbout = jnp.sum(g32, axis=(0, 1))
    if dy is None:
        return dwqkv, dbqkv, dwout, dbout
    # LN param cotangents need xhat: recompute (row ops, one read of x)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xhat = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    if l_actual is not None and l_actual < x.shape[1]:
        row = jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[1],), 0)[None, :, None]
        xhat = jnp.where(row < l_actual, xhat, 0.0)
    dgamma = jnp.sum(dy.astype(jnp.float32) * xhat, axis=(0, 1))
    dbeta = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
    return dwqkv, dbqkv, dwout, dbout, dgamma, dbeta


def _bwd_ln_pallas(num_heads, l_actual, res, g):
    """Kernel-speed replacement for ``_bwd_ln``; exact same cotangents."""
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out = res
    dx, dqkv, dy, y, o = fused_ln_qkv_attention_bwd(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g.astype(x.dtype),
        num_heads, l_actual)
    dwqkv, dbqkv, dwout, dbout, dgamma, dbeta = _attention_weight_cotangents(
        g, dqkv, y, o, x=x, dy=dy, l_actual=l_actual)
    cast = lambda t, like: t.astype(like.dtype)
    return (cast(dx, x), cast(dgamma, ln_scale), cast(dbeta, ln_bias),
            cast(dwqkv, w_qkv), cast(dbqkv, b_qkv), cast(dwout, w_out),
            cast(dbout, b_out))


def _kernel_plain_bwd(x_ref, wqkv_ref, bqkv_ref, wout_ref, g_ref,
                      dx_ref, dqkv_ref, o_ref,
                      *, heads: int, l_actual: int, scale: float):
    """No-LN backward (``fused_attention_block``): dx = dqkv Wqkv^T."""
    x0 = _sanitize_rows(x_ref[0], l_actual)
    g = _sanitize_rows(g_ref[0], l_actual)
    dx, dqkv, _, _, o = _bwd_ln_attention_body(
        x0, None, None, wqkv_ref, bqkv_ref, wout_ref, g,
        heads, l_actual, scale, with_ln=False)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dqkv_ref[0] = dqkv.astype(dqkv_ref.dtype)
    o_ref[0] = o.astype(o_ref.dtype)


def fused_qkv_attention_bwd(x, w_qkv, b_qkv, w_out, g, num_heads: int,
                            l_actual: Optional[int] = None):
    """Pallas backward core for the plain attention block:
    returns (dx, dqkv, o); y == x so dWqkv = x^T dqkv in XLA."""
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    kernel = functools.partial(_kernel_plain_bwd, heads=num_heads,
                               l_actual=l_actual, scale=scale)
    row_spec = lambda w: pl.BlockSpec((1, lp, w), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((b, l, 3 * d), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((b, l, d), x.dtype),       # o
        ),
        grid=(b,),
        in_specs=[
            row_spec(d),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row_spec(d),
        ],
        out_specs=(row_spec(d), row_spec(3 * d), row_spec(d)),
        compiler_params=_cparams("parallel"),
    )(x, w_qkv, b_qkv, w_out, g)


def _bwd_pallas(num_heads, l_actual, res, g):
    """Kernel-speed backward for ``fused_attention_block``."""
    x, w_qkv, b_qkv, w_out, b_out = res
    dx, dqkv, o = fused_qkv_attention_bwd(
        x, w_qkv, b_qkv, w_out, g.astype(x.dtype), num_heads, l_actual)
    dwqkv, dbqkv, dwout, dbout = _attention_weight_cotangents(
        g, dqkv, x, o)  # y == x for the plain (no-LN) block
    cast = lambda t, like: t.astype(like.dtype)
    return (cast(dx, x), cast(dwqkv, w_qkv), cast(dbqkv, b_qkv),
            cast(dwout, w_out), cast(dbout, b_out))


def _bwd_dispatch(num_heads, l_actual, res, g):
    x = res[0]
    if _bwd_vmem_fits(x.shape[1], x.shape[2]):
        return _bwd_pallas(num_heads, l_actual, res, g)
    return _bwd(num_heads, l_actual, res, g)


fused_attention_block.defvjp(_fwd, _bwd_dispatch)


# ---------------------------------------------------------------------------
# FROZEN-backward variant (round 3): the AIM regime never trains the CLIP
# attention weights or ln_1 (reference freeze, vitclip_aim.py:424-427), so
# the dqkv/dy/y/o outputs above — emitted only for XLA to form the (always
# DCE'd) weight cotangents — are pure HBM-write overhead: 6 of the 7 output
# row-units per backward call. This variant writes dX ONLY, which both cuts
# that traffic and shrinks the per-cell VMEM budget enough that ViT-L
# widths run in-kernel (no XLA-remat fallback — closes VERDICT r2 item 2
# without a 2-call split). Weight/LN cotangents are returned as ZEROS;
# apis/train guards that those params are frozen when the fused path is on.


def _kernel_ln_bwd_dx(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                      g_ref, dx_ref, *, heads: int, l_actual: int,
                      scale: float):
    x0 = _sanitize_rows(x_ref[0], l_actual)
    g = _sanitize_rows(g_ref[0], l_actual)
    dx, _, _, _, _ = _bwd_ln_attention_body(
        x0, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, g,
        heads, l_actual, scale)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def fused_ln_qkv_attention_bwd_dx(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                                  g, num_heads: int,
                                  l_actual: Optional[int] = None):
    """dX-only Pallas backward (frozen attention weights)."""
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    kernel = functools.partial(_kernel_ln_bwd_dx, heads=num_heads,
                               l_actual=l_actual, scale=scale)
    row_spec = lambda w: pl.BlockSpec((1, lp, w), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        grid=(b,),
        in_specs=[
            row_spec(d), vec_spec, vec_spec,
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row_spec(d),
        ],
        out_specs=row_spec(d),
        compiler_params=_cparams("parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (2 * lp * d * 3 * d + 6 * lp * lp * d
                           + 2 * lp * d * d),
            bytes_accessed=2 * (3 * b * lp * d * 2 + d * 3 * d + d * d),
            transcendentals=b * num_heads * lp * lp,
        ),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g)


def _bwd_dx_vmem_fits(l: int, d: int) -> bool:
    """3 row units (x, g, dx) double-buffered + resident weights.
    ViT-L (272, 1024): 6*272*1024*2 + 4*1024^2*2 ~ 11.7M -> fits."""
    lp = _round_up(l, 16)
    est = 6 * lp * d * 2 + 4 * d * d * 2
    return est <= 14 * 2 ** 20


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_attention_block_frozen(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                    w_out, b_out, num_heads,
                                    l_actual=None):
    """``out_proj(attn(LN(x)))`` with a dX-only backward: weight/LN
    cotangents are ZEROS (valid only when those params are frozen — the
    AIM regime; apis/train enforces)."""
    return fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                                  b_out, num_heads, l_actual)


def _fwd_ln_frozen(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                   num_heads, l_actual):
    y = fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                               b_out, num_heads, l_actual)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)


def _bwd_ln_frozen(num_heads, l_actual, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out = res
    if _bwd_dx_vmem_fits(x.shape[1], x.shape[2]):
        dx = fused_ln_qkv_attention_bwd_dx(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, g.astype(x.dtype),
            num_heads, l_actual)
    else:  # correctness fallback: exact dx via the XLA-remat backward
        dx = _bwd_ln(num_heads, l_actual, res, g)[0]
    z = jnp.zeros_like
    return (dx, z(ln_scale), z(ln_bias), z(w_qkv), z(b_qkv), z(w_out),
            z(b_out))


fused_ln_attention_block_frozen.defvjp(_fwd_ln_frozen, _bwd_ln_frozen)


# ---------------------------------------------------------------------------
# Experimental: R samples per grid cell — bigger projection matmuls
# (M = R*L_pad rows) to probe whether per-cell M=208 under-fills the MXU.
# MEASURED (v5e, BT=512, r3): r=1 100.3, r=2 99.4, r=4 101.7 TFLOP/s —
# bit-exact vs the r=1 kernel but perf-NEUTRAL, so M-fill is not the
# limiter; the per-cell LN->QKV->12-head-core->out chain pipelines as well
# at M=208 as at M=832. Kept as a documented negative result (not wired).


def _kernel_ln_r(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                 bout_ref, o_ref, *, heads: int, l_actual: int, scale: float,
                 lp: int, r: int):
    rr, lpp, d = x_ref.shape
    x = x_ref[...].reshape(r * lp, d)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % lp
    x = jnp.where(row < l_actual, x, jnp.zeros_like(x))
    xn = _kernel_layernorm(x, lns_ref, lnb_ref, x.dtype)
    qkv = _project_qkv(xn, wqkv_ref, bqkv_ref)  # (R*L_pad, 3D) — big matmul

    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    keymask = jnp.where(col < l_actual, jnp.float32(0.0),
                        jnp.float32(MASK_VALUE))
    hd = d // heads
    outs = []
    for i in range(r):
        qkv_i = qkv[i * lp:(i + 1) * lp]
        for h in range(heads):
            q = qkv_i[:, h * hd:(h + 1) * hd]
            k = qkv_i[:, d + h * hd:d + (h + 1) * hd]
            v = qkv_i[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + keymask
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            o_h = jax.lax.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32) / denom
            outs.append(o_h.astype(x.dtype))
    out = jnp.concatenate(
        [jnp.concatenate(outs[i * heads:(i + 1) * heads], axis=1)
         for i in range(r)], axis=0)  # (R*L_pad, D)
    y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
    y = y + bout_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype).reshape(r, lp, d)


def fused_ln_qkv_attention_r(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, num_heads: int, r: int = 2,
                             l_actual: Optional[int] = None) -> jax.Array:
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    kernel = functools.partial(_kernel_ln_r, heads=num_heads,
                               l_actual=l_actual, scale=scale, lp=lp, r=r)
    ln_specs = [
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    x_spec = pl.BlockSpec((r, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        grid=(-(-b // r),),
        in_specs=[x_spec, *ln_specs, *_WEIGHT_SPECS(d)],
        out_specs=x_spec,
        compiler_params=_cparams("parallel"),
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)


# ---------------------------------------------------------------------------
# Whole-step TRAIN ops (round 3): LN -> attention -> bottleneck adapter ->
# (drop-path gate) -> residual in ONE kernel for BOTH directions. The r3
# profile puts the training step at 53% MFU while the kernels run at ~72% —
# the gap is XLA glue, dominated by the separately-applied adapters
# (remat'd fwd+bwd+recompute stream passes) and drop-path multiplies. These
# ops absorb the adapter into the attention kernels: the backward
# recomputes everything from x, emits dX plus the tiny (u, dpre, a)
# intermediates from which XLA forms EXACT adapter cotangents; frozen
# attention/LN cotangents are zeros (apis/train guards).


def _adapter_fwd_parts(u, w1_ref, b1_ref, w2_ref, b2_ref, dtype):
    """u -> (pre, a, z) with tanh-gelu (matches _adapter_epilogue)."""
    pre = jnp.dot(u.astype(dtype), w1_ref[...],
                  preferred_element_type=jnp.float32)
    pre = pre + b1_ref[...].astype(jnp.float32)
    a = jax.nn.gelu(pre, approximate=True)
    z = jnp.dot(a.astype(dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    return pre, a, z + b2_ref[...].astype(jnp.float32)


def _tanh_gelu_grad(pre):
    c = 0.7978845608028654  # sqrt(2/pi)
    u = c * (pre + 0.044715 * pre ** 3)
    th = jnp.tanh(u)
    return (0.5 * (1 + th)
            + 0.5 * pre * (1 - th ** 2) * c * (1 + 3 * 0.044715 * pre ** 2))


def _kernel_step_bwd_dx(x_ref, gate_ref, lns_ref, lnb_ref, wqkv_ref,
                        bqkv_ref, wout_ref, bout_ref, w1_ref, b1_ref,
                        w2_ref, b2_ref, g_ref, dx_ref, u_ref, dpre_ref,
                        a_ref, *, heads: int, l_actual: int, scale: float,
                        skip: bool, has_gate: bool):
    """Backward of ``x + gate * Adapter(attn(LN(x)))`` — dX in-kernel,
    (u, dpre, a) emitted for XLA's exact adapter dW."""
    x0 = _sanitize_rows(x_ref[0], l_actual)
    g = _sanitize_rows(g_ref[0], l_actual)
    dt = x0.dtype
    gate = (gate_ref[pl.program_id(0), 0].astype(jnp.float32)
            if has_gate else None)

    # recompute forward: LN -> qkv -> probs -> o -> u
    x32 = x0.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mean) * rstd
    lns = lns_ref[...].astype(jnp.float32)
    y = (xhat * lns + lnb_ref[...].astype(jnp.float32)).astype(dt)
    lp, d = x0.shape
    hd = d // heads
    qkv = _project_qkv(y, wqkv_ref, bqkv_ref)

    keymask = _key_mask_strip(lp, l_actual)  # (1, lp) broadcast or None
    o_parts = []
    p_list, q_list, k_list, v_list = [], [], [], []
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + keymask if keymask is not None else s * scale
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        o_parts.append(jax.lax.dot(p.astype(dt), v,
                                   preferred_element_type=jnp.float32)
                       .astype(dt))
        p_list.append(p)
        q_list.append(q)
        k_list.append(k)
        v_list.append(v)
    o = jnp.concatenate(o_parts, axis=1)
    u = (jnp.dot(o, wout_ref[...], preferred_element_type=jnp.float32)
         + bout_ref[...].astype(jnp.float32))  # attention block out, fp32

    # adapter forward + backward (exact)
    pre, a, _ = _adapter_fwd_parts(u.astype(dt), w1_ref, b1_ref, w2_ref,
                                   b2_ref, dt)
    g32 = g.astype(jnp.float32)
    db = g32 * gate if has_gate else g32          # branch cotangent
    da = jax.lax.dot_general(db.astype(dt), w2_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = da * _tanh_gelu_grad(pre)
    du = jax.lax.dot_general(dpre.astype(dt), w1_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if skip:
        du = du + db

    # attention backward with cotangent du at the block output
    do = jax.lax.dot_general(du.astype(dt), wout_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(heads):
        p = p_list[h]
        pb = p.astype(dt)
        do_h = do[:, h * hd:(h + 1) * hd].astype(dt)
        dv = jax.lax.dot_general(pb, do_h, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_h, v_list[h], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rowdot = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - rowdot)).astype(dt)
        dq = jax.lax.dot(ds, k_list[h],
                         preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q_list[h], (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_parts.append(dq.astype(dt))
        dk_parts.append(dk.astype(dt))
        dv_parts.append(dv.astype(dt))
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_parts, axis=1),
         jnp.concatenate(dk_parts, axis=1),
         jnp.concatenate(dv_parts, axis=1)], axis=1)
    dy = jax.lax.dot_general(dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxhat = dy * lns
    mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
    mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - mdx - xhat * mdxx) + g32  # + residual

    dx_ref[0] = dx.astype(dx_ref.dtype)
    u_ref[0] = u.astype(u_ref.dtype)
    dpre_ref[0] = dpre.astype(dpre_ref.dtype)
    a_ref[0] = a.astype(a_ref.dtype)


def fused_step_bwd_dx(x, gate, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                      b_out, w1, b1, w2, b2, g, num_heads: int, skip: bool,
                      l_actual: Optional[int] = None):
    """Returns (dx, u, dpre, a) for the whole-step backward."""
    b, l, d = x.shape
    dh = w1.shape[1]
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    has_gate = gate is not None
    gate_in = (_smem_gate(gate.reshape(b, 1).astype(jnp.float32)) if has_gate
               else jnp.zeros((1, 1), jnp.float32))
    kernel = functools.partial(_kernel_step_bwd_dx, heads=num_heads,
                               l_actual=l_actual, scale=scale, skip=skip,
                               has_gate=has_gate)
    # per-sample scalars live in SMEM (a (1, 1) VMEM block would violate
    # Mosaic's (8, 128)-divisibility rule on the real chip)
    row_spec = lambda w: pl.BlockSpec((1, lp, w), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    adapter_specs = [
        pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec_spec,
    ]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), x.dtype),    # dx
            jax.ShapeDtypeStruct((b, l, d), x.dtype),    # u
            jax.ShapeDtypeStruct((b, l, dh), x.dtype),   # dpre
            jax.ShapeDtypeStruct((b, l, dh), x.dtype),   # a
        ),
        grid=(b,),
        in_specs=[row_spec(d), gate_spec, vec_spec, vec_spec,
                  pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3 * d,), lambda i: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec_spec, *adapter_specs, row_spec(d)],
        out_specs=(row_spec(d), row_spec(d), row_spec(dh), row_spec(dh)),
        compiler_params=_cparams("parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (2 * lp * d * 3 * d + 6 * lp * lp * d
                           + 2 * lp * d * d + 4 * lp * d * dh),
            bytes_accessed=2 * (4 * b * lp * d * 2 + 4 * d * d),
            transcendentals=b * num_heads * lp * lp,
        ),
    )(x, gate_in, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
      w1, b1, w2, b2, g)


# Whole-step spatial train cell budget: ViT-B (~10M) fits the historical
# 16M scope; ViT-L (~16M with transients) took the two-kernel composition.
# With _VMEM_LIMIT raised the cell compiles at ViT-L too — the budget is
# now a PERF choice, env-tunable for on-chip A/B (AIM_STEP_VMEM_BUDGET,
# bytes).
_STEP_VMEM_BUDGET = int(os.environ.get("AIM_STEP_VMEM_BUDGET",
                                       str(12 * 2 ** 20)))


def _step_vmem_fits(l: int, d: int, dh: int) -> bool:
    """x, g in + dx, u, dpre, a out, double-buffered + resident weights
    + the (lp, 3d) qkv transient. ViT-B fits the default budget; ViT-L
    (~16 MB with transients) takes the two-kernel fallback below."""
    lp = _round_up(l, 16)
    est = (2 * (2 + 2) * lp * d + 2 * 2 * lp * dh) * 2 \
        + (4 * d * d + 2 * d * dh) * 2 + lp * 3 * d * 2
    return est <= _STEP_VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_spatial_train_step(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, w1, b1, w2, b2, gate, num_heads, skip,
                             l_actual=None):
    """TRAIN whole-step op: ``x + gate * Adapter(attn(LN(x)))`` with
    in-kernel forward AND backward. Adapter cotangents are EXACT; frozen
    attention/LN cotangents are zeros (AIM regime; apis/train guards).
    ``gate``: (B,) drop-path gate or None."""
    if gate is None:
        return fused_ln_attn_adapter_residual(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
            w1, b1, w2, b2, num_heads, skip, l_actual)
    return fused_ln_attn_adapter_residual_gated(
        x, gate, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
        w1, b1, w2, b2, num_heads, skip, l_actual)


def _fwd_train_step(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, w1,
                    b1, w2, b2, gate, num_heads, skip, l_actual):
    if not _step_vmem_fits(x.shape[1], x.shape[2], w1.shape[1]):
        # ViT-L-class widths take the composition backward: emit the
        # pre-adapter u alongside the output and stash it, cutting the
        # attention kernel passes per train step from 3 to 2 (same move
        # as the temporal T > STEP_BWD_MAX_T path). gate=None rides as an
        # all-ones gate — exact: the gated store multiplies by 1.0.
        gate_eff = (gate if gate is not None
                    else jnp.ones((x.shape[0],), jnp.float32))
        y, u = fused_ln_attn_adapter_residual_gated(
            x, gate_eff, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
            w1, b1, w2, b2, num_heads, skip, l_actual, emit_u=True)
        return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                   w1, b1, w2, b2, gate, u)
    y = fused_spatial_train_step(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                                 b_out, w1, b1, w2, b2, gate, num_heads,
                                 skip, l_actual)
    return y, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
               w1, b1, w2, b2, gate, None)


def _ref_train_step_impl(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                         b_out, w1, b1, w2, b2, gate, num_heads, skip,
                         l_actual=None):
    """XLA oracle of the gated whole step (tanh-gelu adapter)."""
    y = _ref_ln_impl(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                     num_heads, l_actual)
    pre = (y.astype(jnp.float32) @ w1.astype(jnp.float32)
           + b1.astype(jnp.float32))
    a = jax.nn.gelu(pre, approximate=True)
    z = a @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    branch = z + y.astype(jnp.float32) if skip else z
    if gate is not None:
        branch = gate.reshape(-1, 1, 1).astype(jnp.float32) * branch
    return (x.astype(jnp.float32) + branch).astype(x.dtype)


def _gated_cotangent(g32, gate):
    """Branch-output cotangent with the per-sample drop-path gate applied."""
    if gate is None:
        return g32
    return g32 * gate.reshape(-1, 1, 1).astype(jnp.float32)


def _adapter_bwd_xla(u32, db, w1, b1, w2, skip):
    """Exact bottleneck-adapter backward in XLA from the pre-adapter input
    ``u`` and the gated output cotangent ``db`` -> (dpre, a, du)."""
    pre = u32 @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    a = jax.nn.gelu(pre, approximate=True)
    da = db @ w2.astype(jnp.float32).T
    dpre = da * _tanh_gelu_grad(pre)
    du = dpre @ w1.astype(jnp.float32).T
    if skip:
        du = du + db
    return dpre, a, du


def _adapter_weight_cotangents(u, dpre, a, g32, db, gate, skip,
                               w1, b1, w2, b2):
    """(dw1, db1, dw2, db2, dgate) from the adapter intermediates — the one
    shared implementation for every whole-step backward rule (spatial +
    temporal, whole-kernel + composition)."""
    u32 = u.astype(jnp.float32)
    dpre32 = dpre.astype(jnp.float32)
    a32 = a.astype(jnp.float32)
    dw1 = jnp.einsum("bld,blh->dh", u32, dpre32).astype(w1.dtype)
    db1 = jnp.sum(dpre32, axis=(0, 1)).astype(b1.dtype)
    dw2 = jnp.einsum("blh,bld->hd", a32, db).astype(w2.dtype)
    db2 = jnp.sum(db, axis=(0, 1)).astype(b2.dtype)
    dgate = None
    if gate is not None:
        z = a32 @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
        branch = z + u32 if skip else z
        dgate = jnp.sum(g32 * branch, axis=(1, 2)).astype(gate.dtype)
    return dw1, db1, dw2, db2, dgate


def _bwd_train_step(num_heads, skip, l_actual, res, g):
    (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
     w1, b1, w2, b2, gate, u) = res
    if not _step_vmem_fits(x.shape[1], x.shape[2], w1.shape[1]):
        # ViT-L widths: two-kernel composition — u comes from the
        # forward's emit_u stash (round 4; was a full per-layer forward
        # recompute kernel), adapter backward in XLA (exact), dX through
        # attention with the dX-only backward kernel
        g32 = g.astype(jnp.float32)
        db = _gated_cotangent(g32, gate)
        dpre, a, du = _adapter_bwd_xla(u.astype(jnp.float32), db,
                                       w1, b1, w2, skip)
        if _bwd_dx_vmem_fits(x.shape[1], x.shape[2]):
            dx = fused_ln_qkv_attention_bwd_dx(
                x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                du.astype(x.dtype), num_heads, l_actual) + g.astype(x.dtype)
        else:  # ViT-H-class widths: exact XLA-remat dx (same guard as
            # _bwd_ln_frozen — the dX cell itself can exceed VMEM)
            _, vjp = jax.vjp(
                lambda *args: _ref_ln_impl(*args, num_heads, l_actual),
                x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)
            dx = vjp(du.astype(x.dtype))[0] + g.astype(x.dtype)
        dw1, db1, dw2, db2, dgate = _adapter_weight_cotangents(
            u, dpre, a, g32, db, gate, skip, w1, b1, w2, b2)
        z_ = jnp.zeros_like
        return (dx, z_(ln_scale), z_(ln_bias), z_(w_qkv), z_(b_qkv),
                z_(w_out), z_(b_out), dw1, db1, dw2, db2, dgate)
    dx, u, dpre, a = fused_step_bwd_dx(
        x, gate, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
        w1, b1, w2, b2, g.astype(x.dtype), num_heads, skip, l_actual)
    g32 = g.astype(jnp.float32)
    db = _gated_cotangent(g32, gate)
    dw1, db1, dw2, db2, dgate = _adapter_weight_cotangents(
        u, dpre, a, g32, db, gate, skip, w1, b1, w2, b2)
    z_ = jnp.zeros_like
    return (dx, z_(ln_scale), z_(ln_bias), z_(w_qkv), z_(b_qkv), z_(w_out),
            z_(b_out), dw1, db1, dw2, db2, dgate)


fused_spatial_train_step.defvjp(_fwd_train_step, _bwd_train_step)


def _kernel_ln_adapter_res_gated(x_ref, gate_ref, lns_ref, lnb_ref,
                                 wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                                 w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                                 u_ref=None, *, heads: int, l_actual: int,
                                 scale: float, skip: bool):
    """``x + gate * Adapter(attn(LN(x)))`` — the train-mode step forward
    with the drop-path gate applied in-kernel. ``u_ref``: optionally emit
    the pre-adapter attention output — the ViT-L-class composition
    backward (see _bwd_train_step) consumes it from the VJP residuals
    instead of re-running a full forward attention kernel per layer."""
    x0 = _sanitize_rows(x_ref[0], l_actual)
    xn = _kernel_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    y = _attention_body(xn, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                        heads, l_actual, scale, stacked=False)
    if u_ref is not None:
        u_ref[0] = y.astype(u_ref.dtype)
    y = _adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, skip,
                          x_ref.dtype)
    gate = gate_ref[pl.program_id(0), 0].astype(jnp.float32)
    o_ref[0] = (x0.astype(jnp.float32) + gate * y).astype(o_ref.dtype)


def fused_ln_attn_adapter_residual_gated(x, gate, ln_scale, ln_bias, w_qkv,
                                         b_qkv, w_out, b_out, w1, b1, w2,
                                         b2, num_heads: int, skip: bool,
                                         l_actual: Optional[int] = None,
                                         emit_u: bool = False):
    b, l, d = x.shape
    l_actual = l if l_actual is None else l_actual
    lp = _round_up(l, 16)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    dh = w1.shape[1]
    kernel = functools.partial(_kernel_ln_adapter_res_gated, heads=num_heads,
                               l_actual=l_actual, scale=scale, skip=skip)
    vec_spec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    adapter_specs = [
        pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec_spec,
    ]
    x_spec = pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((b, l, d), x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape) if emit_u else out_shape,
        grid=(b,),
        in_specs=[x_spec, gate_spec, vec_spec, vec_spec, *_WEIGHT_SPECS(d),
                  *adapter_specs],
        out_specs=(x_spec, x_spec) if emit_u else x_spec,
        compiler_params=_cparams("parallel"),
    )(x, _smem_gate(gate.reshape(b, 1).astype(jnp.float32)), ln_scale, ln_bias,
      w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2)
