"""ViT_CLIP_ZEROI2V — linear adapters + STDHA temporal head shift
(reference ``mmaction/models/backbones/vit_clip_zeroI2V.py``).

ZeroI2V adapts the frozen CLIP ViT with *linear* bottleneck adapters (no
activation — mergeable into the frozen projections at inference) and models
time by SHIFTING a subset of attention heads' k/v along the frame axis
(STDHA, ``HeadShift`` at reference ``:553-600``):

* ``linear_adapter=True`` (``ths_attention``, ``:153-206``): linear adapters
  wrap q/k/v inputs (or one shared input) and the attention output, plus
  MLP in/out linear adapters.
* ``linear_adapter=False``: classic bottleneck S/MLP adapters around the
  head-shifted attention.
* ``with_t_cls_token``: a temporal-cls summary token is inserted at
  position 1 for the spatial attention and removed after (``:248-302``).

Deviation (documented): the reference's linear-adapter MLP path computes
``mlp(xn + MLP_Adapter_in(xn))`` where ``Linear_Adapter`` ALREADY returns
``x + delta`` (``:305-308``) — i.e. it feeds ``2*xn + delta``, which breaks
the paper's adapter-as-identity-at-init property (and likewise doubles the
MLP output). We implement the init-preserving form
``MLP_Adapter_out(mlp(MLP_Adapter_in(xn)))`` by default;
``reference_compat=True`` reproduces the reference's doubled-residual math
bit-for-bit so released checkpoints trained with that code replicate
(tested against the actual reference module in
tests/test_convert/test_reference_parity.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.layers import (
    Adapter, LinearAdapter, CLIPMLP, LayerNormFP32, trunc_normal_02,
)
from adapt_image_models_tpu.models.backbones.aim import drop_path
from adapt_image_models_tpu.models.backbones.vit_clip import patch_shift

Dtype = jnp.dtype

# STDHA head-shift schedule: head index -> frame roll
# (reference HeadShift.shift, vit_clip_zeroI2V.py:571-597)
HEAD_SHIFTS = {
    8: ((0, 1), (1, -1)),
    16: ((0, 1), (1, -1), (2, 2), (3, -2)),
    32: ((0, 1), (1, -1), (2, 2), (3, -2), (4, 3)),
}


def head_shift(x: jax.Array, num_frames: int, inv: bool = False) -> jax.Array:
    """x: (B*T, H, L, hd) -> roll selected heads along the frame axis."""
    if num_frames not in HEAD_SHIFTS:
        raise ValueError(f"STDHA schedule undefined for T={num_frames} "
                         f"(reference supports 8/16/32)")
    bt, h, l, hd = x.shape
    b = bt // num_frames
    mult = -1 if inv else 1
    feat = x.reshape(b, num_frames, h, l, hd)
    out = feat
    for head_idx, s in HEAD_SHIFTS[num_frames]:
        rolled = jnp.roll(feat[:, :, head_idx], mult * s, axis=1)
        out = out.at[:, :, head_idx].set(rolled)
    return out.reshape(bt, h, l, hd)


class ZeroI2VLinearAdapter(nn.Module):
    """Reference ``Linear_Adapter`` (``:15-37``): fc1 (kaiming, zero bias)
    -> fc2 (zeros) with residual; names D_fc1/D_fc2 for the converter."""

    bottleneck: int = 192
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        kaiming = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
        xs = nn.Dense(self.bottleneck, kernel_init=kaiming,
                      bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="D_fc1")(x)
        xs = nn.Dense(d, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="D_fc2")(xs)
        return x + xs


class CLIPAttnParams(nn.Module):
    """Holds the frozen CLIP attention parameters with converter-compatible
    paths (``attn/in_proj_kernel``, ``attn/out_proj/{kernel,bias}``) while
    letting the block thread adapters/head-shift between the projections."""

    d_model: int
    compute_dtype: Dtype = jnp.float32

    def setup(self):
        self.in_proj_kernel = self.param("in_proj_kernel", trunc_normal_02,
                                         (self.d_model, 3 * self.d_model),
                                         jnp.float32)
        self.in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros,
                                       (3 * self.d_model,), jnp.float32)
        self.out_proj = nn.Dense(self.d_model, kernel_init=trunc_normal_02,
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.compute_dtype, name="out_proj")

    def __call__(self, x):  # pragma: no cover - params-only module
        return x

    def qkv_weights(self):
        cdt = self.compute_dtype
        return (self.in_proj_kernel.astype(cdt),
                self.in_proj_bias.astype(cdt))

    def project_out(self, x):
        return self.out_proj(x)


class ZeroI2VBlock(nn.Module):
    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    num_tadapter: int = 1
    shift_type: str = "ths"  # 'ths' (STDHA) or 'psm' (PatchShift)
    with_t_cls_token: bool = False
    share_adapter: bool = False
    bottleneck: int = 192
    linear_adapter: bool = False
    # reproduce the reference's doubled-residual linear-adapter MLP path
    # (vit_clip_zeroI2V.py:305-308) for released-checkpoint compatibility
    reference_compat: bool = False
    compute_dtype: Dtype = jnp.float32
    deterministic: bool = True

    def _qkv(self, params_holder, x, adapters=None):
        """Project q/k/v with the frozen packed weights, optionally through
        per-projection linear adapters. x: (B', L, D)."""
        attn_w = params_holder["w"]
        attn_b = params_holder["b"]
        d = x.shape[-1]
        wq, wk, wv = jnp.split(attn_w, 3, axis=1)
        bq, bk, bv = jnp.split(attn_b, 3)
        if adapters is None:
            xq = xk = xv = x
        else:
            aq, ak, av = adapters
            xq, xk, xv = aq(x), ak(x), av(x)
        return xq @ wq + bq, xk @ wk + bk, xv @ wv + bv

    @nn.compact
    def __call__(self, x: jax.Array, dpr: jax.Array) -> Tuple[jax.Array, None]:
        deterministic = self.deterministic
        bt, n, d = x.shape
        t = self.num_frames
        b = bt // t
        heads = self.num_heads
        hd = d // heads
        cdt = self.compute_dtype

        ln_1 = LayerNormFP32(name="ln_1")
        ln_2 = LayerNormFP32(name="ln_2")
        mlp = CLIPMLP(compute_dtype=cdt, name="mlp")
        attn_params = CLIPAttnParams(d, compute_dtype=cdt, name="attn")
        w, bias = attn_params.qkv_weights()
        out_proj = attn_params.project_out
        holder = {"w": w, "b": bias}

        rng = self.make_rng("dropout") if not deterministic else None
        rng_s, rng_m = (jax.random.split(rng) if rng is not None
                        else (None, None))
        scale = jnp.asarray(self.adapter_scale, x.dtype)

        def attention(xq_in, xkv_in, with_head_shift=False, adapters=None,
                      out_adapter=None):
            q, k, v = self._qkv(holder, xkv_in, adapters)
            if xq_in is not xkv_in:
                q = self._qkv(holder, xq_in, adapters)[0]
            B, Lq = q.shape[0], q.shape[1]
            Lk = k.shape[1]
            q = q.reshape(B, Lq, heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, Lk, heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, Lk, heads, hd).transpose(0, 2, 1, 3)
            if with_head_shift:
                k = head_shift(k, t)
                v = head_shift(v, t)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.astype(cdt).transpose(0, 2, 1, 3).reshape(B, Lq, d)
            if out_adapter is not None:
                out = out_adapter(out)
            return out_proj(out)

        # temporal-cls summary token ---------------------------------------
        if self.with_t_cls_token:
            t_adapter = Adapter(skip_connect=False, compute_dtype=cdt,
                                name="T_Adapter")
            cls_tok = x[:, :1, :]
            xt = cls_tok.reshape(b, t, 1, d).transpose(0, 2, 1, 3).reshape(b, t, d)
            xt = ln_1(xt)
            if self.num_tadapter == 2:
                xt = Adapter(compute_dtype=cdt, name="T_Adapter_in")(xt)
            xt = t_adapter(attention(xt, xt))
            xt = xt.reshape(b, 1, t, d).transpose(0, 2, 1, 3).reshape(bt, 1, d)
            x = jnp.concatenate([x[:, :1], xt.astype(x.dtype), x[:, 1:]], axis=1)

        if self.shift_type == "ths":
            xln = ln_1(x)
            if self.linear_adapter:
                if self.share_adapter:
                    shared = ZeroI2VLinearAdapter(self.bottleneck, cdt,
                                                  name="Attn_Adapter_in")
                    adapters = (shared, shared, shared)
                else:
                    adapters = (
                        ZeroI2VLinearAdapter(self.bottleneck, cdt, name="Attn_Adapter_q"),
                        ZeroI2VLinearAdapter(self.bottleneck, cdt, name="Attn_Adapter_k"),
                        ZeroI2VLinearAdapter(self.bottleneck, cdt, name="Attn_Adapter_v"),
                    )
                out_ad = ZeroI2VLinearAdapter(self.bottleneck, cdt,
                                              name="Attn_Adapter_out")
                x = x + attention(xln, xln, with_head_shift=True,
                                  adapters=adapters, out_adapter=out_ad)
            else:
                s_adapter = Adapter(skip_connect=False, compute_dtype=cdt,
                                    name="S_Adapter")
                x = x + attention(xln, xln, with_head_shift=True) \
                    + drop_path(rng_s, scale * s_adapter(x), dpr, deterministic)
        elif self.shift_type == "psm":
            s_adapter = Adapter(skip_connect=False, compute_dtype=cdt,
                                name="S_Adapter")
            xln = ln_1(x)
            start = 2 if self.with_t_cls_token else 1
            patches = xln[:, start:, :]
            hw = patches.shape[1]
            hh = ww = int(round(hw ** 0.5))
            shifted = patch_shift(
                patches.reshape(b, t, hh, ww, d)).reshape(bt, hw, d)
            tmp = jnp.concatenate([xln, shifted], axis=1)
            # q from [original + shifted], keys/values from original; keep
            # the first L+start outputs (reference `:283`)
            out = attention(tmp, xln)[:, :n + (1 if self.with_t_cls_token else 0)]
            x = x + s_adapter(out)
        else:
            raise ValueError(f"unknown shift_type {self.shift_type}")

        if self.with_t_cls_token:
            x = jnp.concatenate([x[:, :1], x[:, 2:]], axis=1)

        xn = ln_2(x)
        if self.shift_type == "ths" and self.linear_adapter:
            a_in = ZeroI2VLinearAdapter(self.bottleneck, cdt, name="MLP_Adapter_in")
            a_out = ZeroI2VLinearAdapter(self.bottleneck, cdt, name="MLP_Adapter_out")
            if self.reference_compat:
                # reference math (vit_clip_zeroI2V.py:305-308): the linear
                # adapters' internal residuals are ADDED AGAIN, feeding
                # 2*xn + delta into the MLP and doubling its output
                m = mlp(xn + a_in(xn))
                x = x + m + a_out(m)
            else:
                x = x + a_out(mlp(a_in(xn)))
        else:
            mlp_adapter = Adapter(skip_connect=False, compute_dtype=cdt,
                                  name="MLP_Adapter")
            x = x + mlp(xn) + drop_path(rng_m, scale * mlp_adapter(xn), dpr,
                                        deterministic)
        return x, None


class ZeroI2VTransformer(nn.Module):
    layers: int
    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    num_tadapter: int = 1
    shift_type: str = "ths"
    with_t_cls_token: bool = False
    share_adapter: bool = False
    bottleneck: int = 192
    linear_adapter: bool = False
    reference_compat: bool = False
    drop_path_rate: float = 0.1
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dpr = jnp.linspace(0.0, self.drop_path_rate, self.layers)
        ScanBlocks = nn.scan(
            ZeroI2VBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,), length=self.layers)
        x, _ = ScanBlocks(
            num_heads=self.num_heads, num_frames=self.num_frames,
            adapter_scale=self.adapter_scale, num_tadapter=self.num_tadapter,
            shift_type=self.shift_type,
            with_t_cls_token=self.with_t_cls_token,
            share_adapter=self.share_adapter, bottleneck=self.bottleneck,
            linear_adapter=self.linear_adapter,
            reference_compat=self.reference_compat,
            compute_dtype=self.compute_dtype,
            deterministic=deterministic, name="resblocks")(x, dpr)
        return x


@BACKBONES.register_module()
class ViT_CLIP_ZEROI2V(nn.Module):
    """ZeroI2V backbone (reference ``vit_clip_zeroI2V.py:361``)."""

    input_resolution: int = 224
    num_frames: int = 8
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    drop_path_rate: float = 0.1
    num_tadapter: int = 1
    adapter_scale: float = 0.5
    with_t_cls_token: bool = False
    share_adapter: bool = False
    bottleneck: int = 192
    linear_adapter: bool = False
    reference_compat: bool = False
    shift_type: str = "ths"
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, c, t, h, w = x.shape
        if t != self.num_frames:
            raise ValueError(f"got T={t}, model built for num_frames={self.num_frames}")
        d = self.width
        n_patches = (self.input_resolution // self.patch_size) ** 2
        cdt = self.compute_dtype

        xt = x.transpose(0, 2, 3, 4, 1).reshape(b * t, h, w, c).astype(cdt)
        xt = nn.Conv(d, kernel_size=(self.patch_size, self.patch_size),
                     strides=(self.patch_size, self.patch_size), use_bias=False,
                     dtype=cdt, kernel_init=trunc_normal_02, name="conv1")(xt)
        xt = xt.reshape(b * t, -1, d)

        scale = d ** -0.5
        class_embedding = self.param(
            "class_embedding",
            lambda k, s: scale * jax.random.normal(k, s, jnp.float32), (d,))
        positional_embedding = self.param(
            "positional_embedding",
            lambda k, s: scale * jax.random.normal(k, s, jnp.float32),
            (n_patches + 1, d))
        temporal_embedding = self.param(
            "temporal_embedding", nn.initializers.zeros,
            (1, self.num_frames, d), jnp.float32)

        cls = jnp.broadcast_to(class_embedding.astype(cdt), (b * t, 1, d))
        xt = jnp.concatenate([cls, xt], axis=1)
        xt = xt + positional_embedding.astype(cdt)
        n = xt.shape[1]
        xt = xt.reshape(b, t, n, d).transpose(0, 2, 1, 3)
        xt = xt + temporal_embedding.astype(cdt)[None]
        xt = xt.transpose(0, 2, 1, 3).reshape(b * t, n, d)
        xt = LayerNormFP32(name="ln_pre")(xt)

        xt = ZeroI2VTransformer(
            layers=self.layers, num_heads=self.heads,
            num_frames=self.num_frames, adapter_scale=self.adapter_scale,
            num_tadapter=self.num_tadapter, shift_type=self.shift_type,
            with_t_cls_token=self.with_t_cls_token,
            share_adapter=self.share_adapter, bottleneck=self.bottleneck,
            linear_adapter=self.linear_adapter,
            reference_compat=self.reference_compat,
            drop_path_rate=self.drop_path_rate, compute_dtype=cdt,
            name="transformer")(xt, deterministic=deterministic)

        xt = LayerNormFP32(name="ln_post")(xt)
        return xt[:, 0].reshape(b, t, d)
