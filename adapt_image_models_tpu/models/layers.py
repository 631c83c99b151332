"""Shared building blocks for the AIM model family.

Numerics mirror the reference exactly where accuracy parity depends on it:

* ``LayerNormFP32`` — LN always computed in float32 then cast back
  (reference: ``mmaction/models/backbones/vitclip_aim.py:98-104``).
* ``QuickGELU`` — ``x * sigmoid(1.702 x)`` as in CLIP's frozen MLP
  (reference ``vitclip_aim.py:107-109``).
* ``Adapter`` — ``Linear(D -> D*r) -> GELU(exact) -> Linear(-> D)`` with an
  optional residual (reference ``vitclip_aim.py:78-96``). torch's default
  ``nn.GELU`` is the exact erf form, so ``approximate=False`` here.
* ``CLIPAttention`` — packed-QKV multi-head attention matching
  ``nn.MultiheadAttention``'s manual-projection path
  (reference ``vitclip_aim.py:153-193``), batch-first ``(B, L, D)`` layout
  (TPU-friendly; the reference's LND layout is a torch idiom).

Dtype policy: params live in fp32 ("master" copies); matmuls run in a
configurable ``compute_dtype`` (bf16 on TPU); LayerNorm and softmax stay
fp32. This supersedes the reference's apex-O1 AMP (`apis/train.py:87-99`).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = jnp.dtype

# ---------------------------------------------------------------------------
# activations


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def exact_gelu(x: jax.Array) -> jax.Array:
    # torch nn.GELU() default = exact erf form.
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# initializers (parity with the reference's init_weights, vitclip_aim.py:364-423)

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


# ---------------------------------------------------------------------------
# LayerNorm with fp32 island


class LayerNormFP32(nn.Module):
    """LayerNorm computed in float32 regardless of input dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


class LayerNormParams(nn.Module):
    """:class:`LayerNormFP32` twin with directly-accessible scale/bias
    (identical param tree) so fused Pallas kernels can run the LN in their
    prologue instead of a separate HBM round-trip."""

    dim: int
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,),
                                jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                               jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * self.scale + self.bias).astype(orig_dtype)


# ---------------------------------------------------------------------------
# Stochastic depth


class DropPath(nn.Module):
    """Per-sample stochastic depth on the leading (batch) axis."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep, shape=shape)
        # multiply (not where): where saves its full-broadcast pred tensor
        # for the backward; the multiply saves only the (B, 1, ...) gate
        return x * (mask.astype(x.dtype) / jnp.asarray(keep, x.dtype))


# ---------------------------------------------------------------------------
# Adapter — THE trainable unit of AIM


class Adapter(nn.Module):
    """MLP-bottleneck adapter (reference ``vitclip_aim.py:78-96``).

    ``D_fc2`` is zero-initialised so a freshly-inserted adapter is an
    identity (skip) / zero (no-skip) function — matching the reference's
    explicit zero-init of every adapter's second projection
    (``vitclip_aim.py:398-423``).
    """

    mlp_ratio: float = 0.25
    skip_connect: bool = True
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        hidden = int(d * self.mlp_ratio)
        xs = nn.Dense(hidden, kernel_init=trunc_normal_02,
                      bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="D_fc1")(x)
        xs = exact_gelu(xs)
        xs = nn.Dense(d, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="D_fc2")(xs)
        if self.skip_connect:
            return x + xs
        return xs


class LinearAdapter(nn.Module):
    """ZeroI2V-style linear bottleneck adapter: no activation, residual add.

    Reference ``vit_clip_zeroI2V.py:15-38``: ``Linear(D -> D/r)`` kaiming-
    uniform init, ``Linear(D/r -> D)`` zero init, output added to input.
    """

    down_ratio: int = 2
    skip_connect: bool = True
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        hidden = d // self.down_ratio
        # torch kaiming_uniform_(a=sqrt(5)) on a (out,in) weight ==
        # uniform(+-1/sqrt(fan_in)); flax variance_scaling equivalent:
        kaiming = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
        xs = nn.Dense(hidden, kernel_init=kaiming, bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="down")(x)
        xs = nn.Dense(d, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="up")(xs)
        if self.skip_connect:
            return x + xs
        return xs


# ---------------------------------------------------------------------------
# Attention core — pluggable so a Pallas flash kernel can replace it


def xla_attention_core(q: jax.Array, k: jax.Array, v: jax.Array,
                       mask: Optional[jax.Array] = None) -> jax.Array:
    """Reference attention math. q,k,v: (B, H, L, hd). mask: additive,
    broadcastable to (B, H, Lq, Lk). Softmax in fp32."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def get_attention_core(name: str) -> Callable:
    """'xla' -> einsum reference; 'flash' -> Pallas flash-attention kernel."""
    if name == "xla":
        return xla_attention_core
    if name == "flash":
        from adapt_image_models_tpu.ops.flash_attention import flash_attention_entry
        return flash_attention_entry
    raise ValueError(f"unknown attention core: {name}")


class DenseParams(nn.Module):
    """Dense layer with directly-accessible params (kernel/bias names match
    nn.Dense so checkpoint converters see an identical tree). Used where a
    fused Pallas kernel needs the raw weights."""

    features_in: int
    features_out: int
    compute_dtype: Dtype = jnp.float32
    kernel_init: Callable = trunc_normal_02

    def setup(self):
        self.kernel = self.param("kernel", self.kernel_init,
                                 (self.features_in, self.features_out),
                                 jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features_out,), jnp.float32)

    def __call__(self, x):
        cdt = self.compute_dtype
        return x.astype(cdt) @ self.kernel.astype(cdt) + self.bias.astype(cdt)


class AdapterParams(nn.Module):
    """Setup-based :class:`Adapter` twin with directly-accessible weights
    (identical param tree: D_fc1/D_fc2 kernel+bias, zero-init D_fc2) for the
    fused attention+adapter Pallas kernels."""

    d_model: int
    mlp_ratio: float = 0.25
    skip_connect: bool = True
    compute_dtype: Dtype = jnp.float32

    def setup(self):
        hidden = int(self.d_model * self.mlp_ratio)
        self.D_fc1 = DenseParams(self.d_model, hidden,
                                 compute_dtype=self.compute_dtype)
        self.D_fc2 = DenseParams(hidden, self.d_model,
                                 compute_dtype=self.compute_dtype,
                                 kernel_init=nn.initializers.zeros)

    def __call__(self, x):
        xs = self.D_fc2(exact_gelu(self.D_fc1(x)))
        return x + xs if self.skip_connect else xs

    def weights(self, dtype):
        return (self.D_fc1.kernel.astype(dtype), self.D_fc1.bias.astype(dtype),
                self.D_fc2.kernel.astype(dtype), self.D_fc2.bias.astype(dtype))


class CLIPAttention(nn.Module):
    """Multi-head attention with CLIP's packed in-projection.

    Params:
      in_proj/kernel  (D, 3D)   — columns ordered [q | k | v]
      in_proj/bias    (3D,)
      out_proj/kernel (D, D)
      out_proj/bias   (D,)

    Supports self-attention (``kv=None``) and cross-attention (q from ``x``,
    k/v from ``kv``) — the reference uses the latter for patch-shift
    cross-attention (``vit_clip.py:164-197``).
    """

    num_heads: int
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"
    # dX-only Pallas backwards (weight/LN cotangents = ZEROS): valid only
    # when the CLIP attention weights + LN are frozen — the AIM training
    # regime (apis/train guards). Cuts 6/7 of the backward kernels' HBM
    # writes and fits ViT-L widths in VMEM.
    frozen_backward: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, kv: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 need_weights: bool = False,
                 temporal_frames: Optional[int] = None,
                 adapter: Optional["AdapterParams"] = None,
                 ln: Optional["LayerNormParams"] = None,
                 residual: bool = False,
                 gate: Optional[jax.Array] = None) -> jax.Array:
        """Self/cross attention over the sequence axis — or, when
        ``temporal_frames=T`` is given, over the FRAME axis of a
        ``(B*T, N, D)`` tensor without materializing the
        ``(B T) N D <-> (B N) T D`` relayout (SURVEY.md §7 hard part 2):
        projections run per-token in the native layout and only the tiny
        attention core uses a batched einsum across frames.
        """
        d = x.shape[-1]
        if d % self.num_heads:
            raise ValueError(f"d_model {d} not divisible by heads {self.num_heads}")
        hd = d // self.num_heads
        w = self.param("in_proj_kernel", trunc_normal_02, (d, 3 * d), jnp.float32)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        cdt = self.compute_dtype
        out_proj = DenseParams(d, d, compute_dtype=cdt, name="out_proj")

        if (self.attention_core == "fused" and kv is None and mask is None
                and not need_weights):
            # fully-fused Pallas paths (TPU only): (optional fp32 LN) + QKV
            # proj + attention + out proj (+ optional bottleneck-adapter
            # epilogue) in one kernel
            xin = x if ln is not None else x.astype(cdt)
            common = (xin, w.astype(cdt), b.astype(cdt),
                      out_proj.kernel.astype(cdt), out_proj.bias.astype(cdt))
            if ln is not None and adapter is not None and residual:
                # whole adaptation step in ONE kernel:
                # x + Adapter(attn(LN(x)))  (eval-mode AIM block step)
                wargs = (xin.astype(cdt), ln.scale, ln.bias, *common[1:],
                         *adapter.weights(cdt))
                if temporal_frames is None:
                    from adapt_image_models_tpu.ops.fused_qkv_attention import (
                        fused_spatial_step_block, fused_spatial_train_step,
                    )
                    if self.frozen_backward or gate is not None:
                        # train: in-kernel fwd AND bwd (exact adapter dW,
                        # frozen-attn zeros)
                        return fused_spatial_train_step(
                            *wargs, gate, self.num_heads,
                            adapter.skip_connect, None)
                    return fused_spatial_step_block(
                        *wargs, self.num_heads, adapter.skip_connect, None)
                from adapt_image_models_tpu.ops.fused_temporal_attention import (
                    fused_temporal_step_block, fused_temporal_train_step,
                )
                if self.frozen_backward or gate is not None:
                    return fused_temporal_train_step(
                        *wargs, gate, temporal_frames, self.num_heads,
                        adapter.skip_connect)
                return fused_temporal_step_block(
                    *wargs, temporal_frames, self.num_heads,
                    adapter.skip_connect)
            if residual:
                raise ValueError("residual fusion requires ln and adapter")
            if temporal_frames is None:
                from adapt_image_models_tpu.ops.fused_qkv_attention import (
                    fused_attention_block, fused_attention_adapter_block,
                    fused_ln_attention_block,
                )
                if ln is not None:
                    if adapter is not None:
                        raise ValueError("ln+adapter fusion unsupported")
                    if self.frozen_backward:
                        from adapt_image_models_tpu.ops.fused_qkv_attention \
                            import fused_ln_attention_block_frozen
                        return fused_ln_attention_block_frozen(
                            xin.astype(cdt), ln.scale, ln.bias, *common[1:],
                            self.num_heads)
                    return fused_ln_attention_block(
                        xin.astype(cdt), ln.scale, ln.bias, *common[1:],
                        self.num_heads)
                if adapter is not None:
                    return fused_attention_adapter_block(
                        *common, *adapter.weights(cdt), self.num_heads,
                        adapter.skip_connect)
                return fused_attention_block(*common, self.num_heads)
            from adapt_image_models_tpu.ops.fused_temporal_attention import (
                fused_temporal_block, fused_temporal_adapter_block,
                fused_ln_temporal_block,
            )
            if ln is not None:
                if adapter is not None:
                    raise ValueError("ln+adapter fusion unsupported")
                if self.frozen_backward:
                    from adapt_image_models_tpu.ops.fused_temporal_attention \
                        import fused_ln_temporal_block_frozen
                    return fused_ln_temporal_block_frozen(
                        xin.astype(cdt), ln.scale, ln.bias, *common[1:],
                        temporal_frames, self.num_heads)
                return fused_ln_temporal_block(
                    xin.astype(cdt), ln.scale, ln.bias, *common[1:],
                    temporal_frames, self.num_heads)
            if adapter is not None:
                return fused_temporal_adapter_block(
                    *common, *adapter.weights(cdt), temporal_frames,
                    self.num_heads, adapter.skip_connect)
            return fused_temporal_block(*common, temporal_frames,
                                        self.num_heads)
        if adapter is not None:
            raise ValueError("adapter fusion requires attention_core='fused'")
        if ln is not None:  # non-fused fallback: apply the LN here
            x = ln(x)

        xq = x.astype(cdt)
        xkv = (kv if kv is not None else x).astype(cdt)
        wq, wk, wv = jnp.split(w.astype(cdt), 3, axis=1)
        bq, bk, bv = jnp.split(b.astype(cdt), 3)
        q = xq @ wq + bq
        k = xkv @ wk + bk
        v = xkv @ wv + bv

        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]

        if temporal_frames is not None:
            if kv is not None or mask is not None or need_weights:
                raise ValueError("temporal_frames supports plain self-attention")
            t = temporal_frames
            bb = B // t
            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
            qh = q.reshape(bb, t, Lq, self.num_heads, hd)
            kh = k.reshape(bb, t, Lq, self.num_heads, hd)
            vh = v.reshape(bb, t, Lq, self.num_heads, hd)
            logits = jnp.einsum("bqnhd,bknhd->bnhqk", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bnhqk,bknhd->bqnhd", probs.astype(vh.dtype), vh,
                             preferred_element_type=jnp.float32)
            out = out.astype(cdt).reshape(B, Lq, d)
            return out_proj(out)

        q = q.reshape(B, Lq, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, self.num_heads, hd).transpose(0, 2, 1, 3)

        core_name = self.attention_core if self.attention_core != "fused" else "xla"
        core = get_attention_core(core_name)
        out = core(q, k, v, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, d)
        out = out_proj(out)
        if need_weights:
            # fork's per-sample attention mass statistic
            # (vit_clip.py:147-152): sum over queries/keys of
            # exp(sum over heads of raw logits); used for the lambda blend.
            # stop_gradient mirrors the reference's torch.no_grad.
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
            w = jnp.sum(jnp.exp(jnp.sum(logits, axis=1)).reshape(B, -1), -1)
            return out, jax.lax.stop_gradient(w)
        return out


class CLIPMLPParams(nn.Module):
    """Setup-based :class:`CLIPMLP` twin with directly-accessible weights
    (identical param tree: c_fc/c_proj kernel+bias) for the fused
    joint-adaptation Pallas kernel."""

    d_model: int
    compute_dtype: Dtype = jnp.float32

    def setup(self):
        self.c_fc = DenseParams(self.d_model, 4 * self.d_model,
                                compute_dtype=self.compute_dtype)
        self.c_proj = DenseParams(4 * self.d_model, self.d_model,
                                  compute_dtype=self.compute_dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.c_proj(quick_gelu(self.c_fc(x)))

    def weights(self, dtype):
        return (self.c_fc.kernel.astype(dtype), self.c_fc.bias.astype(dtype),
                self.c_proj.kernel.astype(dtype),
                self.c_proj.bias.astype(dtype))


class CLIPMLP(nn.Module):
    """CLIP transformer MLP: c_fc (D->4D) -> QuickGELU -> c_proj (4D->D)."""

    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        x = nn.Dense(4 * d, kernel_init=trunc_normal_02,
                     bias_init=nn.initializers.zeros,
                     dtype=self.compute_dtype, name="c_fc")(x)
        x = quick_gelu(x)
        x = nn.Dense(d, kernel_init=trunc_normal_02,
                     bias_init=nn.initializers.zeros,
                     dtype=self.compute_dtype, name="c_proj")(x)
        return x
