#!/usr/bin/env python
"""In-KERNEL knockout attribution for the spatial / temporal eval steps.

The model-level knockout table (docs/benchmark.md) puts the fused spatial
attention step at ~66% of its FLOPs floor while the joint MLP hits ~89%.
This script splits the step's time INSIDE the kernel: each variant removes
one stage (LN prologue, QK+softmax+AV, softmax only, adapter epilogue)
while keeping the cell's IO and grid identical, timed with the chained
fori_loop methodology (distinct inputs per iteration, forced scalar fetch,
identity-chain floor measured alongside — see PARITY.md round-3 notes on
relay memoization and chain-glue).

    python tools/analysis/knockout_spatial_kernel.py [--step spatial|temporal]
        [--bt 512] [--apps 24]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import adapt_image_models_tpu.ops.fused_qkv_attention as fqa
import adapt_image_models_tpu.ops.fused_temporal_attention as fta

D, HEADS, L, DH, T = 768, 12, 197, 192, 8


def _attention_body_variant(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                            heads, l_actual, scale, mode):
    """The stacked eval attention body with one stage knocked out."""
    lp, d = x.shape
    hd = d // heads
    x = fqa._sanitize_rows(x, l_actual)
    qkv = fqa._project_qkv(x, wqkv_ref, bqkv_ref)

    if mode == "noscores":
        # keep projections only: out := q (same shape/dtype as attn output)
        out = qkv[:, :d]
        y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
        return y + bout_ref[...].astype(jnp.float32)

    q_all = qkv[:, :d]
    if fqa._is_pow2(scale):
        q_all = (q_all.astype(jnp.float32) * scale).astype(qkv.dtype)
    keymask = None
    if l_actual < lp:
        col = jax.lax.broadcasted_iota(jnp.int32, (8, lp), 1)
        keymask = jnp.where(col < l_actual, jnp.float32(0.0),
                            jnp.float32(fqa.MASK_VALUE))[:1]
    if mode == "softmax_t":
        # TRANSPOSED scores: S_T (keys, queries) = K @ Q^T so the softmax
        # max/sum reduce over SUBLANES (fast VPU direction) instead of
        # lanes; AV contracts the sublane dim of P_T directly.
        keymask_t = None
        if l_actual < lp:
            row = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
            keymask_t = jnp.where(row < l_actual, jnp.float32(0.0),
                                  jnp.float32(fqa.MASK_VALUE))
        outs = []
        for h in range(heads):
            q = q_all[:, h * hd:(h + 1) * hd]
            k = qkv[:, d + h * hd:d + (h + 1) * hd]
            v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
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

    chunk = max(1, min(heads, fqa._STACK_ROWS // lp))
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
        if keymask is not None:
            S = S + keymask
        if mode == "nosoftmax":
            pb = (S * 0.001).astype(qkv.dtype)
            denom = None
        elif mode == "softmax_fast":
            # no max-subtraction (valid when logits are bounded; measurement
            # mode) + the lane-direction sum via a ones-matmul on the MXU
            # instead of a VPU cross-lane reduction
            p = jnp.exp(S)
            ones = jnp.ones((S.shape[1], 8), jnp.bfloat16)
            denom = jnp.dot(p.astype(jnp.bfloat16), ones,
                            preferred_element_type=jnp.float32)[:, :1]
            pb = p.astype(qkv.dtype)
        else:
            m = jnp.max(S, axis=1, keepdims=True)
            p = jnp.exp(S - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            pb = p.astype(qkv.dtype)
        for i, h in enumerate(range(h0, h0 + hc)):
            v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            o_h = jax.lax.dot(pb[i * lp:(i + 1) * lp], v,
                              preferred_element_type=jnp.float32)
            if denom is not None:
                o_h = o_h / denom[i * lp:(i + 1) * lp]
            outs.append(o_h.astype(x.dtype))
    out = jnp.concatenate(outs, axis=1)
    y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
    return y + bout_ref[...].astype(jnp.float32)


def _fast_layernorm(x, scale_ref, bias_ref, dtype, eps: float = 1e-5):
    """LN with the cross-lane moment reductions done as ones-matmuls on the
    MXU (lane-direction VPU reductions are the slow direction); same math,
    different reduction order."""
    d = x.shape[-1]
    x32 = x.astype(jnp.float32)
    ones = jnp.full((d, 8), 1.0 / d, jnp.float32)
    mean = jnp.dot(x32, ones, preferred_element_type=jnp.float32)[:, :1]
    meansq = jnp.dot(jnp.square(x32), ones,
                     preferred_element_type=jnp.float32)[:, :1]
    var = meansq - jnp.square(mean)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * scale_ref[...].astype(jnp.float32)
         + bias_ref[...].astype(jnp.float32))
    return y.astype(dtype)


def _kernel_variant(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                    bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                    heads, l_actual, scale, mode):
    if mode == "identity":
        o_ref[0] = x_ref[0]
        return
    x0 = fqa._sanitize_rows(x_ref[0], l_actual)
    if mode == "noln":
        xn = x0
    elif mode == "fastln":
        xn = _fast_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    else:
        xn = fqa._kernel_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    y = _attention_body_variant(xn, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                                heads, l_actual, scale, mode)
    if mode != "noadapter":
        y = fqa._adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, True,
                                  x_ref.dtype)
    o_ref[0] = (x0.astype(jnp.float32) + y).astype(o_ref.dtype)


def _masked_core_variant(q, k, v, t, gw, heads, scale, dtype, mode):
    """Stacked masked-full core with the softmax optionally knocked out."""
    grows, d = q.shape
    hd = d // heads
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    ss = []
    for h in range(heads):
        s = jax.lax.dot_general(q[:, h * hd:(h + 1) * hd],
                                k[:, h * hd:(h + 1) * hd],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ss.append(s)
    S = ss[0] if heads == 1 else jnp.concatenate(ss, axis=0)
    ri = jax.lax.broadcasted_iota(jnp.int32, S.shape, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    S = jnp.where((ri % gw) == (ci % gw), S, S + jnp.float32(fta.MASK_VALUE))
    if mode == "nosoftmax":
        pb = (S * 0.001).astype(v.dtype)
        denom = None
    else:
        m = jnp.max(S, axis=1, keepdims=True)
        p = jnp.exp(S - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pb = p.astype(v.dtype)
    outs = []
    for h in range(heads):
        oh = jax.lax.dot(pb[h * grows:(h + 1) * grows],
                         v[:, h * hd:(h + 1) * hd],
                         preferred_element_type=jnp.float32)
        if denom is not None:
            oh = oh / denom[h * grows:(h + 1) * grows]
        outs.append(oh.astype(dtype))
    return jnp.concatenate(outs, axis=1)


def _temporal_body_variant(x, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                           t, heads, scale, mode):
    rows, d = x.shape
    tile = rows // t
    w = wqkv_ref[...]
    b = bqkv_ref[...]
    q = (jnp.dot(x, w[:, :d], preferred_element_type=jnp.float32)
         + b[:d].astype(jnp.float32)).astype(x.dtype)
    if mode == "noscores":
        out = q
    else:
        k = (jnp.dot(x, w[:, d:2 * d], preferred_element_type=jnp.float32)
             + b[d:2 * d].astype(jnp.float32)).astype(x.dtype)
        v = (jnp.dot(x, w[:, 2 * d:], preferred_element_type=jnp.float32)
             + b[2 * d:].astype(jnp.float32)).astype(x.dtype)
        group = fta._core_group(t)
        q3 = q.reshape(t, tile, d)
        k3 = k.reshape(t, tile, d)
        v3 = v.reshape(t, tile, d)
        o_groups = []
        for g0 in range(0, tile, group):
            ge = min(tile, g0 + group)
            gw = ge - g0
            og = _masked_core_variant(
                q3[:, g0:ge, :].reshape(t * gw, d),
                k3[:, g0:ge, :].reshape(t * gw, d),
                v3[:, g0:ge, :].reshape(t * gw, d),
                t, gw, heads, scale, x.dtype, mode)
            o_groups.append(og.reshape(t, gw, d))
        out = jnp.concatenate(o_groups, axis=1).reshape(rows, d)
    y = jnp.dot(out, wout_ref[...], preferred_element_type=jnp.float32)
    return y + bout_ref[...].astype(jnp.float32)


def _kernel_temporal_variant(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                             wout_ref, bout_ref, w1_ref, b1_ref, w2_ref,
                             b2_ref, o_ref, *, t, heads, scale, n, mode):
    if mode == "identity":
        o_ref[...] = x_ref[...]
        return
    tt, tile, d = x_ref.shape
    x0 = fta._sanitize_block(x_ref[...].reshape(t * tile, d), tile, n or tile)
    if mode == "noln":
        xn = x0
    elif mode == "fastln":
        xn = _fast_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    else:
        xn = fqa._kernel_layernorm(x0, lns_ref, lnb_ref, x_ref.dtype)
    y = _temporal_body_variant(xn, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                               t, heads, scale, mode)
    if mode != "noadapter":
        y = fqa._adapter_epilogue(y, w1_ref, b1_ref, w2_ref, b2_ref, False,
                                  x_ref.dtype)
    out = x0.astype(jnp.float32) + y
    o_ref[...] = out.astype(o_ref.dtype).reshape(t, tile, d)


def step_fn_temporal(mode, weights, bt):
    n = L
    tile = fta._auto_tile(D, T, None, n, wide=True)
    scale = 1.0 / ((D // HEADS) ** 0.5)
    b = bt // T
    kernel = functools.partial(_kernel_temporal_variant, t=T, heads=HEADS,
                               scale=scale, n=n, mode=mode)
    vec = pl.BlockSpec((D,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((T, tile, D), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec((D, 3 * D), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * D,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, D), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        vec,
    ]
    ad_specs = [
        pl.BlockSpec((D, DH), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((DH,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((DH, D), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        vec,
    ]
    n_cells = pl.cdiv(n, tile)

    def apply(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bt, n, D), x.dtype),
            grid=(b, n_cells),
            in_specs=[x_spec, vec, vec, *w_specs, *ad_specs],
            out_specs=x_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(x, *weights)

    return apply


D4 = 4 * D
MLP_SCALE = 0.5


def _kernel_mlp_variant(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref,
                        wproj_ref, bproj_ref, w1_ref, b1_ref, w2_ref,
                        b2_ref, o_ref, *, mode):
    if mode == "identity":
        o_ref[0] = x_ref[0]
        return
    x = x_ref[0]
    if mode == "noln":
        xn = x
    elif mode == "fastln":
        xn = _fast_layernorm(x, lns_ref, lnb_ref, x.dtype)
    else:
        xn = fqa._kernel_layernorm(x, lns_ref, lnb_ref, x.dtype)
    acc = x.astype(jnp.float32) + bproj_ref[...].astype(jnp.float32)
    if mode != "noadapter":
        a = jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
        a = jax.nn.gelu(a + b1_ref[...].astype(jnp.float32),
                        approximate=True)
        z = jnp.dot(a.astype(x.dtype), w2_ref[...],
                    preferred_element_type=jnp.float32)
        acc = acc + MLP_SCALE * (z + b2_ref[...].astype(jnp.float32))
    if mode != "nohidden":
        h = jnp.dot(xn, wfc_ref[...], preferred_element_type=jnp.float32)
        h = h + bfc_ref[...].astype(jnp.float32)
        if mode != "nogelu":
            h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU, fp32
        acc = acc + jnp.dot(h.astype(x.dtype), wproj_ref[...],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def step_fn_mlp(mode, weights, bt):
    kernel = functools.partial(_kernel_mlp_variant, mode=mode)
    vec = pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def apply(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bt, L, D), x.dtype),
            grid=(bt,),
            in_specs=[
                x_spec, vec, vec,
                pl.BlockSpec((D, D4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D4,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((D4, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec,
                pl.BlockSpec((D, DH), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((DH,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((DH, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec,
            ],
            out_specs=x_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, *weights)

    return apply


def step_fn(mode, weights, bt):
    lp = fqa._round_up(L, 16)
    scale = 1.0 / ((D // HEADS) ** 0.5)
    kernel = functools.partial(_kernel_variant, heads=HEADS, l_actual=L,
                               scale=scale, mode=mode)
    vec = pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, lp, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    ad_specs = [
        pl.BlockSpec((D, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((DH,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((DH, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec,
    ]

    def apply(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bt, L, D), x.dtype),
            grid=(bt,),
            in_specs=[x_spec, vec, vec, *fqa._WEIGHT_SPECS(D), *ad_specs],
            out_specs=x_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, *weights)

    return apply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", choices=["spatial", "temporal", "mlp"],
                    default="spatial")
    ap.add_argument("--bt", type=int, default=512)
    ap.add_argument("--apps", type=int, default=24)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", nargs="+",
                    default=["identity", "full", "noln", "nosoftmax",
                             "noscores", "noadapter"])
    args = ap.parse_args()

    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    mk = lambda i, shape, s=0.03: (jax.random.normal(ks[i], shape, jnp.float32)
                                   * s).astype(jnp.bfloat16)
    if args.step == "mlp":
        weights = (mk(0, (D,), 1.0) + 1, mk(1, (D,)), mk(2, (D, D4)),
                   mk(3, (D4,)), mk(4, (D4, D)), mk(5, (D,)),
                   mk(6, (D, DH)), mk(7, (DH,)), mk(8, (DH, D)),
                   mk(9, (D,)))
    else:
        weights = (mk(0, (D,), 1.0) + 1, mk(1, (D,)), mk(2, (D, 3 * D)),
                   mk(3, (3 * D,)), mk(4, (D, D)), mk(5, (D,)),
                   mk(6, (D, DH)), mk(7, (DH,)), mk(8, (DH, D)),
                   mk(9, (D,)))

    mk_step = {"spatial": step_fn, "temporal": step_fn_temporal,
               "mlp": step_fn_mlp}[args.step]
    results = {}
    for mode in args.modes:
        apply = mk_step(mode, weights, args.bt)

        @jax.jit
        def chain(x):
            def body(_, x):
                return apply(x)
            return jax.lax.fori_loop(0, args.apps, body, x)

        xs = [jax.random.normal(jax.random.PRNGKey(100 + i),
                                (args.bt, L, D), jnp.float32
                                ).astype(jnp.bfloat16) * 0.1
              for i in range(args.iters)]
        _ = float(chain(xs[0]).astype(jnp.float32).sum())  # compile+warm
        times = []
        for x in xs:
            t0 = time.perf_counter()
            _ = float(chain(x).astype(jnp.float32).sum())
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        us_per_app = med / args.apps * 1e6
        results[mode] = us_per_app
        print(json.dumps({"mode": mode, "us_per_app": round(us_per_app, 1),
                          "ms_chain": round(med * 1e3, 2)}), flush=True)

    if "full" in results and "identity" in results:
        floor = results["identity"]
        full = results["full"] - floor
        print(json.dumps({
            "floor_us": round(floor, 1),
            "full_minus_floor_us": round(full, 1),
            **{f"delta_{m}_us": round(results["full"] - results[m], 1)
               for m in results if m not in ("full", "identity")},
        }), flush=True)


if __name__ == "__main__":
    main()
