"""Pallas TPU fused attention for AIM's short sequences.

The reference gets fused attention from flash-attn CUDA kernels
(``vitclip_aim_flash.py:14-15``). On TPU, AIM's sequences are short
(spatial N=197 for ViT-B/224, 257 for ViT-L; temporal T=8..32), so the
classic HBM-avoiding *tiled* flash attention is overkill — the entire
(L, L) score tile fits in VMEM. What actually costs time in the XLA path is
materializing fp32 logits/probs in HBM between the two matmuls (measured:
~60% of spatial-attention wall time at batch 32).

This kernel therefore does single-tile fused attention per (batch, head)
grid cell: QK^T -> masked fp32 softmax -> PV entirely in VMEM/registers.
Inputs are padded to lane-aligned lengths in the wrapper; padded keys are
masked with a large negative constant (never -inf: exp(-inf - -inf) = NaN).

Backward: ``fused_attention`` wraps the kernel in a custom_vjp whose
backward recomputes probabilities with the XLA reference math — the same
rematerialization trade flash-attn makes, with XLA handling the (cheap)
backward matmuls.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adapt_image_models_tpu.ops.fused_qkv_attention import _cparams

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      l_k: int, heads: int, block_b: int):
    """One grid cell = ``block_b`` batch elements, all heads unrolled.

    Blocks are (block_b, H, L_pad, hd) — head_dim stays unpadded (Mosaic
    pads lanes in VMEM; padding in HBM would double DMA + MXU work).
    """
    lp = q_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    keymask = jnp.where(col < l_k, jnp.float32(0.0), jnp.float32(MASK_VALUE))
    for bb in range(block_b):
        for h in range(heads):
            q = q_ref[bb, h]
            k = k_ref[bb, h]
            v = v_ref[bb, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + keymask
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            o_ref[bb, h] = (o / denom).astype(o_ref.dtype)


def flash_attention_core(q: jax.Array, k: jax.Array, v: jax.Array,
                         mask: Optional[jax.Array] = None) -> jax.Array:
    """Drop-in replacement for ``xla_attention_core``.

    q, k, v: (B, H, L, hd). ``mask`` is not supported by the fused kernel
    (window-attention variants pass one) — falls back to the XLA core.
    """
    if mask is not None:
        from adapt_image_models_tpu.models.layers import xla_attention_core
        return xla_attention_core(q, k, v, mask)

    b, h, l_q, hd = q.shape
    l_k = k.shape[2]
    if l_k != l_q:
        from adapt_image_models_tpu.models.layers import xla_attention_core
        return xla_attention_core(q, k, v, mask)
    scale = 1.0 / (hd ** 0.5)

    lp = _round_up(l_q, 128)
    block_b = 2 if b % 2 == 0 else 1
    # VMEM guard: 4 tensors x block_b x h x lp x 128(lane-padded) x 2B + scores
    while block_b > 1 and (4 * block_b * h * lp * 128 * 2) > 8 * 2 ** 20:
        block_b //= 2

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, lp - x.shape[2]), (0, 0)))

    kernel = functools.partial(_attention_kernel, scale=scale, l_k=l_k,
                               heads=h, block_b=block_b)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, lp, hd), q.dtype),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, lp, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_specs=pl.BlockSpec((block_b, h, lp, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams("parallel"),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * lp * lp * hd,
            bytes_accessed=4 * b * h * lp * hd * 2,
            transcendentals=b * h * lp * lp,
        ),
    )(pad(q), pad(k), pad(v))
    return out[:, :, :l_q, :]


@jax.custom_vjp
def fused_attention(q, k, v):
    return flash_attention_core(q, k, v)


def _fused_fwd(q, k, v):
    return flash_attention_core(q, k, v), (q, k, v)


def _fused_bwd(res, g):
    q, k, v = res

    def ref(q, k, v):
        from adapt_image_models_tpu.models.layers import xla_attention_core
        return xla_attention_core(q, k, v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_fwd, _fused_bwd)


def flash_attention_entry(q, k, v, mask=None):
    """Attention-core entry point: fused Pallas kernel (custom-vjp) when
    unmasked; XLA reference when a window/shift mask is present."""
    if mask is not None:
        from adapt_image_models_tpu.models.layers import xla_attention_core
        return xla_attention_core(q, k, v, mask)
    return fused_attention(q, k, v)
