"""ViT_CLIP_RES_TUNING — res-tuning dual-stream AIM variant
(reference ``mmaction/models/backbones/vit_clip_flash_restuning.py:240``,
block at ``:138-199``).

Each block: temporal-cls attention inserted as a prompt token, parallel
spatial adaptation (``x + attn(ln_1(x)) + drop_path(scale*S_Adapter(x))``,
all adapters ``skip_connect=False``), and — with ``shift=True`` — a residual
SIDE STREAM ``x_res`` accumulated across blocks from patch-shift
cross-attention (``:181``). The reference builds its flash-attn MHA; here
the shared :class:`CLIPAttention` keeps the converter key map.

Reference quirks handled:
* with ``shift=False`` the reference block references an undefined
  ``x_temporal`` (crash); we carry ``x_res`` through unchanged instead.
* the accumulated side stream is never merged back into the output in the
  reference (``Transformer.forward`` returns only ``x``, ``:230-240``) —
  replicated faithfully (the stream exists, is differentiable, and is
  returned by the backbone for probing, but does not alter logits).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.layers import (
    Adapter, CLIPAttention, CLIPMLP, LayerNormFP32, trunc_normal_02,
)
from adapt_image_models_tpu.models.backbones.aim import drop_path
from adapt_image_models_tpu.models.backbones.vit_clip import patch_shift

Dtype = jnp.dtype


class ResTuningBlock(nn.Module):
    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    shift: bool = True
    compute_dtype: Dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, dpr: jax.Array):
        x, x_res = carry
        deterministic = self.deterministic
        bt, n, d = x.shape
        t = self.num_frames
        b = bt // t
        cdt = self.compute_dtype

        attn = CLIPAttention(self.num_heads, compute_dtype=cdt, name="attn")
        ln_1 = LayerNormFP32(name="ln_1")
        ln_2 = LayerNormFP32(name="ln_2")
        mlp = CLIPMLP(compute_dtype=cdt, name="mlp")
        s_adapter = Adapter(skip_connect=False, compute_dtype=cdt,
                            name="S_Adapter")
        t_adapter = Adapter(skip_connect=False, compute_dtype=cdt,
                            name="T_Adapter")
        mlp_adapter = Adapter(skip_connect=False, compute_dtype=cdt,
                              name="MLP_Adapter")

        rng = self.make_rng("dropout") if not deterministic else None
        rng_s, rng_r, rng_m = (jax.random.split(rng, 3) if rng is not None
                               else (None, None, None))
        scale = jnp.asarray(self.adapter_scale, x.dtype)

        # temporal-cls summary, inserted at index 1 (reference :144-161)
        cls_tok = x[:, :1, :]
        xt = cls_tok.reshape(b, t, 1, d).transpose(0, 2, 1, 3).reshape(b, t, d)
        xt = t_adapter(attn(ln_1(xt)))
        xt = xt.reshape(b, 1, t, d).transpose(0, 2, 1, 3).reshape(bt, 1, d)
        x = jnp.concatenate([x[:, :1], xt.astype(x.dtype), x[:, 1:]], axis=1)

        xln = ln_1(x)
        if self.shift:
            patches = xln[:, 2:, :]
            hw = patches.shape[1]
            hh = ww = int(round(hw ** 0.5))
            shifted = patch_shift(
                patches.reshape(b, t, hh, ww, d)).reshape(bt, hw, d)
            # main stream: parallel spatial adaptation (reference :177)
            x = x + attn(xln) + drop_path(rng_s, scale * s_adapter(x), dpr,
                                          deterministic)
            # side stream: cross-attention to the shifted tokens, accumulated
            # across blocks (reference :181)
            cross = attn(ln_1(x), kv=ln_1(shifted))
            x_res = x + drop_path(rng_r, scale * s_adapter(cross), dpr,
                                  deterministic) + x_res
        else:
            x = x + attn(xln) + drop_path(rng_s, scale * s_adapter(x), dpr,
                                          deterministic)

        # remove the prompt token, joint adaptation
        x = jnp.concatenate([x[:, :1], x[:, 2:]], axis=1)
        xn = ln_2(x)
        x = x + mlp(xn) + drop_path(rng_m, scale * mlp_adapter(xn), dpr,
                                    deterministic)
        return (x, x_res), None


class ResTuningTransformer(nn.Module):
    layers: int
    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    shift: bool = True
    drop_path_rate: float = 0.1
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        dpr = jnp.linspace(0.0, self.drop_path_rate, self.layers)
        ScanBlocks = nn.scan(
            ResTuningBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,), length=self.layers)
        # side stream starts at 0.0 (reference :232); carried with N+1 tokens
        bt, n, d = x.shape
        x_res0 = jnp.zeros((bt, n + 1, d), x.dtype)
        (x, x_res), _ = ScanBlocks(
            num_heads=self.num_heads, num_frames=self.num_frames,
            adapter_scale=self.adapter_scale, shift=self.shift,
            compute_dtype=self.compute_dtype, deterministic=deterministic,
            name="resblocks")((x, x_res0), dpr)
        return x, x_res


@BACKBONES.register_module()
class ViT_CLIP_RES_TUNING(nn.Module):
    """Res-tuning backbone (flash-attn variant's math, TPU attention)."""

    input_resolution: int = 224
    num_frames: int = 8
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    drop_path_rate: float = 0.1
    adapter_scale: float = 0.5
    shift: bool = True
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

        xt, _x_res = ResTuningTransformer(
            layers=self.layers, num_heads=self.heads,
            num_frames=self.num_frames, adapter_scale=self.adapter_scale,
            shift=self.shift, drop_path_rate=self.drop_path_rate,
            compute_dtype=cdt, name="transformer")(
                xt, deterministic=deterministic)

        xt = LayerNormFP32(name="ln_post")(xt)
        return xt[:, 0].reshape(b, t, d)


def ViT_CLIP_FLASH_RES_TUNING(**kwargs):
    """Reference-name alias (``vit_clip_flash_restuning.py:240``).
    ``use_flash_attn``/``checkpoint`` are absorbed (res-tuning has no
    per-block remat here; the side stream is cheap)."""
    kwargs.pop("use_flash_attn", None)
    kwargs.pop("checkpoint", None)
    return ViT_CLIP_RES_TUNING(**kwargs)


BACKBONES.register_module(name="ViT_CLIP_FLASH_RES_TUNING",
                          module=ViT_CLIP_FLASH_RES_TUNING)
