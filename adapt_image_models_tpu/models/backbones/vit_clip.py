"""ViT_CLIP — the fork's modified AIM backbone
(reference ``mmaction/models/backbones/vit_clip.py:328-458``).

Differences from canonical AIM (``aim.py``), mirrored exactly:
* temporal attention runs on the CLASS TOKEN ONLY (`:220-229`): per frame the
  cls token attends across T, producing one temporal summary per frame
* spatial step (`:264-275`, default ``shift=False``): a lambda-weighted blend
  of self-attention and CROSS-attention to the temporal cls summaries —
  lambda derived from each path's total attention mass (no grad through it):
      x += (1-lam) * self_attn + drop_path(scale * S_Adapter(lam * cross_attn))
* ``shift=True`` (`:233-254`): PatchShift pattern-C rolls patch tokens along
  T per (h%3, w%3) cell, then x += 0.5*self_attn + 0.5*cross_attn(x, shifted)
  + drop_path(scale * S_Adapter(x)).
  NOTE the reference slices ``xln[2:]`` (drops cls AND the first patch) which
  cannot reshape to HxW — a latent bug making that path unrunnable there; we
  shift all patch tokens (``[1:]``) as the pattern intends.
* all three adapters are ``skip_connect=False`` here (`:106-113`), unlike
  canonical AIM where S_Adapter has the inner residual.
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

Dtype = jnp.dtype

# PatchShift pattern C (reference vit_clip.py:38-46): (row%3, col%3) -> roll.
# 9-fold + 4-fold receptive-field variants per vit_clip_flash.py:42-57.
PATCH_SHIFT_PATTERNS = {
    9: (3, (((0, 0), -4), ((0, 1), 1), ((1, 0), -1), ((0, 2), 2),
            ((2, 0), -2), ((1, 2), 3), ((2, 1), -3), ((2, 2), 4))),
    4: (2, (((0, 0), -2), ((0, 1), 1), ((1, 0), -1), ((1, 1), 2))),
}


def patch_shift(x: jax.Array, inv: bool = False, rf: int = 9) -> jax.Array:
    """x: (B, T, H, W, C); rolls (h%s, w%s) cells along T per the rf-fold
    pattern (rf in {9, 4})."""
    if rf not in PATCH_SHIFT_PATTERNS:
        raise ValueError(f"patch_shift rf must be 9 or 4, got {rf}")
    step, pattern = PATCH_SHIFT_PATTERNS[rf]
    mult = -1 if inv else 1
    out = x
    for (i, j), shift in pattern:
        rolled = jnp.roll(x[:, :, i::step, j::step, :], mult * shift, axis=1)
        out = out.at[:, :, i::step, j::step, :].set(rolled)
    return out


class ViTCLIPBlock(nn.Module):
    """Fork block: cls-temporal attention + lambda-blend / patch-shift."""

    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    shift: bool = False
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, dpr: jax.Array) -> Tuple[jax.Array, None]:
        # x: (B*T, N, D)
        deterministic = self.deterministic
        bt, n, d = x.shape
        t = self.num_frames
        b = bt // t

        attn = CLIPAttention(self.num_heads, compute_dtype=self.compute_dtype,
                             attention_core=self.attention_core, name="attn")
        ln_1 = LayerNormFP32(name="ln_1")
        ln_2 = LayerNormFP32(name="ln_2")
        mlp = CLIPMLP(compute_dtype=self.compute_dtype, name="mlp")
        s_adapter = Adapter(skip_connect=False,
                            compute_dtype=self.compute_dtype, name="S_Adapter")
        t_adapter = Adapter(skip_connect=False,
                            compute_dtype=self.compute_dtype, name="T_Adapter")
        mlp_adapter = Adapter(skip_connect=False,
                              compute_dtype=self.compute_dtype,
                              name="MLP_Adapter")

        rng = self.make_rng("dropout") if not deterministic else None
        if rng is not None:
            rng_s, rng_m = jax.random.split(rng)
        else:
            rng_s = rng_m = None
        scale = jnp.asarray(self.adapter_scale, x.dtype)

        # temporal attention on the class token only (vit_clip.py:220-229)
        cls_tok = x[:, :1, :]  # (B*T, 1, D)
        xt = cls_tok.reshape(b, t, 1, d).transpose(0, 2, 1, 3).reshape(b, t, d)
        xt = t_adapter(attn(ln_1(xt)))  # (B, T, D)
        xt = xt.reshape(b, 1, t, d).transpose(0, 2, 1, 3).reshape(bt, 1, d)

        if self.shift:
            # patch-shift cross-attention path (vit_clip.py:233-254)
            xln = ln_1(x)
            hw = n - 1
            h = w = int(round(hw ** 0.5))
            patches = xln[:, 1:, :].reshape(b, t, h, w, d)
            shifted = patch_shift(patches).reshape(bt, hw, d)
            x = (x + 0.5 * attn(xln) + 0.5 * attn(xln, kv=shifted)
                 + drop_path(rng_s, scale * s_adapter(x), dpr, deterministic))
        else:
            # lambda blend of self-attention and cross-attention to the
            # temporal cls summary (vit_clip.py:264-275)
            xln = ln_1(x)
            ori_attn, ori_w = attn(xln, need_weights=True)
            crs_attn, crs_w = attn(xln, kv=xt, need_weights=True)
            lam = (crs_w / (crs_w + ori_w)).astype(x.dtype)[:, None, None]
            x = (x + (1.0 - lam) * ori_attn
                 + drop_path(rng_s, scale * s_adapter(lam * crs_attn), dpr,
                             deterministic))

        # joint adaptation (identical to canonical AIM)
        xn = ln_2(x)
        x = x + mlp(xn) + drop_path(rng_m, scale * mlp_adapter(xn), dpr,
                                    deterministic)
        return x, None


class ViTCLIPTransformer(nn.Module):
    """Scan-stacked fork blocks; param path ``transformer/resblocks`` matches
    the CLIP/AIM checkpoint converters."""

    layers: int
    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    shift: bool = False
    drop_path_rate: float = 0.1
    use_checkpoint: bool = False
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dpr = jnp.linspace(0.0, self.drop_path_rate, self.layers)
        block_cls = ViTCLIPBlock
        if self.use_checkpoint:
            block_cls = nn.remat(ViTCLIPBlock)
        ScanBlocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,), length=self.layers)
        x, _ = ScanBlocks(
            num_heads=self.num_heads, num_frames=self.num_frames,
            adapter_scale=self.adapter_scale, shift=self.shift,
            compute_dtype=self.compute_dtype,
            attention_core=self.attention_core,
            deterministic=deterministic, name="resblocks")(x, dpr)
        return x


@BACKBONES.register_module()
class ViT_CLIP(nn.Module):
    """Fork ViT_CLIP backbone (reference ``vit_clip.py:328``).

    Same embedding/freeze/IO contract as :class:`AIM`; only the block math
    differs. Output ``(B, T, D)``.
    """

    input_resolution: int = 224
    num_frames: int = 8
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    drop_path_rate: float = 0.1
    adapter_scale: float = 0.5
    shift: bool = False
    use_checkpoint: bool = False
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"
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

        xt = ViTCLIPTransformer(
            layers=self.layers, num_heads=self.heads,
            num_frames=self.num_frames, adapter_scale=self.adapter_scale,
            shift=self.shift, drop_path_rate=self.drop_path_rate,
            use_checkpoint=self.use_checkpoint, compute_dtype=cdt,
            attention_core=self.attention_core, name="transformer")(
                xt, deterministic=deterministic)

        xt = LayerNormFP32(name="ln_post")(xt)
        return xt[:, 0].reshape(b, t, d)


def ViT_CLIP_FLASH(**kwargs):
    """Reference-name alias (``vit_clip_flash.py``): the flash-attn fork of
    ViT_CLIP maps to ViT_CLIP with the fused Pallas attention core.
    Reference kwargs translate: ``checkpoint`` -> ``use_checkpoint``;
    ``use_flash_attn`` is absorbed (fusion is the attention_core)."""
    kwargs.pop("use_flash_attn", None)
    if kwargs.pop("checkpoint", False):
        kwargs["use_checkpoint"] = True
    kwargs.setdefault("attention_core", "fused")
    return ViT_CLIP(**kwargs)


BACKBONES.register_module(name="ViT_CLIP_FLASH", module=ViT_CLIP_FLASH)
