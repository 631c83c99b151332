"""SwinTransformer2D_Adapter — AIM adapters grafted onto 2D Swin
(reference ``mmaction/models/backbones/swin2d_adapter.py:601-833``).

Hierarchical frozen-image-Swin with per-block:
* even blocks: temporal attention over frame tokens reusing the SAME window
  qkv/proj weights with a learned temporal relative position bias
  (``:218-236``), output through ``T_Adapter`` (no skip) with drop-path
* (shifted-)window attention with relative position bias, output through
  ``SAdapter2`` (inner residual), residual WITHOUT drop-path (``:398``)
* FFN: ``x + mlp(xn) + drop_path(0.5 * S_Adapter(xn))`` — the 0.5 is
  hard-coded in the reference (``:404``); ``S_Adapter`` has no skip there
* PatchMerging downsampling between stages; PatchEmbed3D (Conv3D) stem.

Output: (B, T', H', W', C_final) feature map (the reference emits
``B C T H W``); the I3D head pools all of T'/H'/W'.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.layers import exact_gelu, trunc_normal_02
from adapt_image_models_tpu.models.backbones.aim import drop_path

Dtype = jnp.dtype


def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Standard Swin 2D relative-position index (reference ``:186-198``)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def _window_partition_2d(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse_2d(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _shift_mask_2d(h: int, w: int, ws: int, ss: int) -> np.ndarray:
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img[hs, wsl] = cnt
            cnt += 1
    x = img.reshape(h // ws, ws, w // ws, ws)
    x = x.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = x[:, None, :] - x[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinAdapter(nn.Module):
    """Bottleneck adapter; ``skip`` selects Adapter/T_Adapter (no inner
    residual, reference ``:11-26,45-60``) vs SAdapter2 (``:28-43``)."""

    skip: bool = False
    mlp_ratio: float = 0.25
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        xs = nn.Dense(int(d * self.mlp_ratio), kernel_init=trunc_normal_02,
                      bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="D_fc1")(x)
        xs = exact_gelu(xs)
        xs = nn.Dense(d, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.compute_dtype, name="D_fc2")(xs)
        return x + xs if self.skip else xs


class WindowAttention(nn.Module):
    """W-MSA with relative position bias + optional temporal mode sharing
    the same projections (reference ``:159-256``)."""

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    num_ttokens: int = 8
    use_temporal: bool = True
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 temporal: bool = False) -> jax.Array:
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        cdt = self.compute_dtype

        qkv = nn.Dense(3 * c, kernel_init=trunc_normal_02,
                       bias_init=nn.initializers.zeros, dtype=cdt,
                       name="qkv")(x.astype(cdt))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b_, n, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(b_, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b_, n, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)

        if temporal:
            t = self.num_ttokens
            table = self.param("temporal_position_bias_table",
                               trunc_normal_02, (2 * t - 1, h), jnp.float32)
            idx = np.arange(t)[:, None] - np.arange(t)[None, :] + t - 1
            bias = table[jnp.asarray(idx.reshape(-1))].reshape(t, t, h)
            attn = attn + bias.transpose(2, 0, 1)[None]
        else:
            wh, ww = self.window_size
            table = self.param("relative_position_bias_table", trunc_normal_02,
                               ((2 * wh - 1) * (2 * ww - 1), h), jnp.float32)
            idx = _relative_position_index(wh, ww)
            bias = table[jnp.asarray(idx.reshape(-1))].reshape(
                wh * ww, wh * ww, h)
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
        return nn.Dense(c, kernel_init=trunc_normal_02,
                        bias_init=nn.initializers.zeros, dtype=cdt,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_frames: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    t_attn: bool = False
    mlp_ratio: float = 4.0
    dpr: float = 0.0
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        hres, wres = self.input_resolution
        ws, ss = self.window_size, self.shift_size
        if min(self.input_resolution) <= ws:
            ws, ss = min(self.input_resolution), 0
        bt, l, c = x.shape
        t = self.num_frames
        b = bt // t
        cdt = self.compute_dtype
        dpr = jnp.asarray(self.dpr)

        attn = WindowAttention(self.dim, (ws, ws), self.num_heads,
                               num_ttokens=t, use_temporal=self.t_attn,
                               compute_dtype=cdt, name="attn")
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        rng = self.make_rng("dropout") if not deterministic else None
        rng_t, rng_m = (jax.random.split(rng) if rng is not None
                        else (None, None))

        if self.t_attn:
            t_adapter = SwinAdapter(skip=False, compute_dtype=cdt,
                                    name="T_Adapter")
            xt = x.reshape(b, t, l, c).transpose(0, 2, 1, 3).reshape(b * l, t, c)
            res = t_adapter(attn(norm1(xt).astype(cdt), temporal=True))
            res = res.reshape(b, l, t, c).transpose(0, 2, 1, 3).reshape(bt, l, c)
            x = x + drop_path(rng_t, res, dpr, deterministic)

        shortcut = x
        xn = norm1(x).astype(cdt).reshape(bt, hres, wres, c)
        if ss > 0:
            xn = jnp.roll(xn, (-ss, -ss), axis=(1, 2))
            mask = jnp.asarray(_shift_mask_2d(hres, wres, ws, ss))
        else:
            mask = None
        windows = _window_partition_2d(xn, ws)
        windows = attn(windows, mask=mask)
        windows = SwinAdapter(skip=True, compute_dtype=cdt,
                              name="S_Adapter2")(windows)
        xn = _window_reverse_2d(windows.astype(cdt), ws, hres, wres)
        if ss > 0:
            xn = jnp.roll(xn, (ss, ss), axis=(1, 2))
        x = shortcut + xn.reshape(bt, l, c)  # no drop-path here (`:398`)

        xn2 = norm2(x).astype(cdt)
        h_mlp = nn.Dense(int(c * self.mlp_ratio), kernel_init=trunc_normal_02,
                         bias_init=nn.initializers.zeros, dtype=cdt,
                         name="mlp_fc1")(xn2)
        h_mlp = exact_gelu(h_mlp)
        h_mlp = nn.Dense(c, kernel_init=trunc_normal_02,
                         bias_init=nn.initializers.zeros, dtype=cdt,
                         name="mlp_fc2")(h_mlp)
        s_out = SwinAdapter(skip=False, compute_dtype=cdt, name="S_Adapter")(xn2)
        x = x + h_mlp + drop_path(rng_m, 0.5 * s_out, dpr, deterministic)
        return x


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> norm -> linear 4C->2C (reference ``:428``)."""

    input_resolution: Tuple[int, int]
    dim: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        bt, l, c = x.shape
        x = x.reshape(bt, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(bt, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, kernel_init=trunc_normal_02,
                        dtype=self.compute_dtype, name="reduction")(
                            x.astype(self.compute_dtype))


@BACKBONES.register_module()
class SwinTransformer2D_Adapter(nn.Module):
    img_size: int = 224
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    num_frames: int = 32
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    t_relative: bool = True
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, c, t, hh, ww = x.shape
        pt, ph, pw = self.patch_size
        cdt = self.compute_dtype

        # PatchEmbed3D: Conv3D stem over NDHWC
        xt = x.transpose(0, 2, 3, 4, 1).astype(cdt)  # (B, T, H, W, C)
        xt = nn.Conv(self.embed_dim, kernel_size=(pt, ph, pw),
                     strides=(pt, ph, pw), dtype=cdt,
                     kernel_init=trunc_normal_02, name="patch_embed")(xt)
        tt = xt.shape[1]
        hres, wres = xt.shape[2], xt.shape[3]
        xt = xt.reshape(b * tt, hres * wres, self.embed_dim)
        if self.patch_norm:
            xt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="patch_norm")(xt).astype(cdt)

        if not self.t_relative:
            temporal_embedding = self.param(
                "temporal_embedding", trunc_normal_02,
                (1, tt, self.embed_dim), jnp.float32)
            xt = xt.reshape(b, tt, -1, self.embed_dim).transpose(0, 2, 1, 3)
            xt = xt + temporal_embedding.astype(cdt)[None]
            xt = xt.transpose(0, 2, 1, 3).reshape(b * tt, hres * wres,
                                                  self.embed_dim)

        dprs = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        di = 0
        dim = self.embed_dim
        res = (hres, wres)
        for i_layer, depth in enumerate(self.depths):
            for i_blk in range(depth):
                xt = SwinBlock(
                    dim=dim, input_resolution=res, num_frames=tt,
                    num_heads=self.num_heads[i_layer],
                    window_size=self.window_size,
                    shift_size=0 if i_blk % 2 == 0 else self.window_size // 2,
                    t_attn=(i_blk % 2 == 0), mlp_ratio=self.mlp_ratio,
                    dpr=dprs[di], compute_dtype=cdt,
                    name=f"layers_{i_layer}_blocks_{i_blk}")(
                        xt, deterministic=deterministic)
                di += 1
            if i_layer < len(self.depths) - 1:
                xt = PatchMerging(res, dim, compute_dtype=cdt,
                                  name=f"layers_{i_layer}_downsample")(xt)
                dim *= 2
                res = (res[0] // 2, res[1] // 2)

        xt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(xt)
        # (B*T', H'*W', C) -> (B, T', H', W', C)
        return xt.reshape(b, tt, res[0], res[1], dim)
