"""SwinTransformer3D (Video Swin) and SwinTransformer2D baselines
(reference ``mmaction/models/backbones/swin_transformer.py`` (~600 LoC) and
``swin2d.py`` — the frozen-image-Swin / Video-Swin baselines the adapter
variant builds on).

Video Swin: PatchEmbed3D stem, stages of 3D (shifted-)window attention with
a 3D relative position bias, spatial PatchMerging between stages.
SwinTransformer2D = the adapter-less 2D model (Swin2D-Adapter with every
adapter removed) — provided by reusing that file's blocks with adapters
zeroed out is wasteful, so a thin standalone is defined here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.layers import exact_gelu, trunc_normal_02
from adapt_image_models_tpu.models.backbones.window import (
    get_window_size, window_partition, window_reverse, compute_shift_mask,
    pad_to_windows,
)
from adapt_image_models_tpu.models.backbones.swin2d_adapter import (
    PatchMerging, SwinBlock,
)

Dtype = jnp.dtype


def _relative_position_index_3d(wt: int, wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wt), np.arange(wh),
                                  np.arange(ww), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wt - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= (2 * ww - 1)
    return rel.sum(-1)


class WindowAttention3D(nn.Module):
    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        cdt = self.compute_dtype
        wt, wh, ww = self.window_size

        qkv = nn.Dense(3 * c, kernel_init=trunc_normal_02, dtype=cdt,
                       name="qkv")(x.astype(cdt))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b_, n, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(b_, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b_, n, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)

        table = self.param(
            "relative_position_bias_table", trunc_normal_02,
            ((2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1), h), jnp.float32)
        idx = _relative_position_index_3d(wt, wh, ww)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, h)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, h, n, n)
        probs = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(cdt).transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, kernel_init=trunc_normal_02, dtype=cdt,
                        name="proj")(out)


class SwinBlock3D(nn.Module):
    dim: int
    input_res: Tuple[int, int, int]  # (T', H', W')
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shifted: bool = False
    mlp_ratio: float = 4.0
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        tt, hh, ww = self.input_res
        bt, l, c = x.shape  # here bt == B, tokens flattened over (T',H',W')
        cdt = self.compute_dtype

        ws, ss = get_window_size(
            self.input_res, self.window_size,
            tuple(i // 2 for i in self.window_size) if self.shifted
            else (0, 0, 0))
        if not self.shifted:
            ss = (0, 0, 0)

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                          name="norm1")(x).astype(cdt)
        xn = xn.reshape(bt, tt, hh, ww, c)
        xn = pad_to_windows(xn, ws)
        tp, hp, wp = xn.shape[1:4]
        if any(ss):
            xn = jnp.roll(xn, tuple(-s for s in ss), axis=(1, 2, 3))
            mask = jnp.asarray(compute_shift_mask(tp, hp, wp, ws, ss))
        else:
            mask = None
        parts = window_partition(xn, ws)
        parts = WindowAttention3D(self.dim, ws, self.num_heads,
                                  compute_dtype=cdt, name="attn")(parts, mask)
        xn = window_reverse(parts.astype(cdt), ws, bt, tp, hp, wp)
        if any(ss):
            xn = jnp.roll(xn, ss, axis=(1, 2, 3))
        xn = xn[:, :tt, :hh, :ww, :].reshape(bt, l, c)
        x = shortcut + xn

        xn2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           name="norm2")(x).astype(cdt)
        hdn = nn.Dense(int(c * self.mlp_ratio), kernel_init=trunc_normal_02,
                       dtype=cdt, name="mlp_fc1")(xn2)
        hdn = nn.Dense(c, kernel_init=trunc_normal_02, dtype=cdt,
                       name="mlp_fc2")(exact_gelu(hdn))
        return x + hdn


@BACKBONES.register_module()
class SwinTransformer3D(nn.Module):
    """Video Swin. Input (B, C, T, H, W) -> (B, T', H', W', C_final)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (2, 7, 7)
    patch_norm: bool = True
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b = x.shape[0]
        pt, ph, pw = self.patch_size
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 4, 1).astype(cdt)
        h = nn.Conv(self.embed_dim, (pt, ph, pw), (pt, ph, pw), dtype=cdt,
                    kernel_init=trunc_normal_02, name="patch_embed")(h)
        tt, hh, ww = h.shape[1:4]
        h = h.reshape(b, tt * hh * ww, self.embed_dim)
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="patch_norm")(h).astype(cdt)

        dim = self.embed_dim
        res = (tt, hh, ww)
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                h = SwinBlock3D(dim, res, self.num_heads[i],
                                window_size=tuple(self.window_size),
                                shifted=(j % 2 == 1), compute_dtype=cdt,
                                name=f"layers_{i}_blocks_{j}")(
                                    h, deterministic=deterministic)
            if i < len(self.depths) - 1:
                # spatial-only patch merging (Video Swin keeps T)
                hm = h.reshape(b * res[0], res[1] * res[2], dim)
                hm = PatchMerging((res[1], res[2]), dim, compute_dtype=cdt,
                                  name=f"layers_{i}_downsample")(hm)
                res = (res[0], res[1] // 2, res[2] // 2)
                dim *= 2
                h = hm.reshape(b, res[0] * res[1] * res[2], dim)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(h)
        return h.reshape(b, res[0], res[1], res[2], dim)


@BACKBONES.register_module()
class SwinTransformer2D(nn.Module):
    """Plain 2D Swin over per-frame images (the frozen-image baseline).
    Input (B*T, C, H, W) or (B, C, T, H, W) -> pooled per-frame features."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        squeeze_time = x.ndim == 5
        if squeeze_time:
            b, c, t, hh, ww = x.shape
            x = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, hh, ww)
        h = x.transpose(0, 2, 3, 1).astype(self.compute_dtype)
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    (self.patch_size, self.patch_size),
                    dtype=self.compute_dtype, kernel_init=trunc_normal_02,
                    name="patch_embed")(h)
        hres, wres = h.shape[1:3]
        h = h.reshape(h.shape[0], hres * wres, self.embed_dim)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="patch_norm")(h).astype(self.compute_dtype)

        dim = self.embed_dim
        res = (hres, wres)
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                # reuse the adapter Swin block with adapters disabled via
                # zero-width? simpler: 3D block with T'=1 windows
                h3 = h.reshape(h.shape[0], 1, res[0], res[1], dim)
                h3 = h3.reshape(h.shape[0], res[0] * res[1], dim)
                h = SwinBlock3D(dim, (1, res[0], res[1]), self.num_heads[i],
                                window_size=(1, self.window_size,
                                             self.window_size),
                                shifted=(j % 2 == 1),
                                compute_dtype=self.compute_dtype,
                                name=f"layers_{i}_blocks_{j}")(
                                    h3, deterministic=deterministic)
            if i < len(self.depths) - 1:
                h = PatchMerging(res, dim, compute_dtype=self.compute_dtype,
                                 name=f"layers_{i}_downsample")(h)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(h)
        return jnp.mean(h, axis=1).astype(jnp.float32)
