"""ViT_ImageNet — AIM adapters on a timm-style ImageNet ViT
(reference ``mmaction/models/backbones/vit_imagenet.py:148-261``).

Same canonical AIM block order as :class:`AIM` (temporal -> spatial ->
joint, ``vit_imagenet.py:110-125``) but on the timm ViT skeleton:
* exact-GELU MLP (not CLIP's QuickGELU)
* LayerNorm eps 1e-6
* no ``ln_pre``; patch-embed conv has a bias; qkv projection has bias
* zero-init cls/pos embeddings with trunc-normal(0.02) init
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.layers import (
    Adapter, CLIPAttention, exact_gelu, trunc_normal_02,
)
from adapt_image_models_tpu.models.backbones.aim import drop_path

Dtype = jnp.dtype


class LayerNormEps6(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        from adapt_image_models_tpu.models.layers import LayerNormFP32
        return LayerNormFP32(epsilon=self.epsilon, name="ln")(x)


class TimmMLP(nn.Module):
    """fc1 -> GELU -> fc2 (timm naming; reference ``vit_imagenet.py:36-52``)."""

    mlp_ratio: float = 4.0
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = int(d * self.mlp_ratio)
        x = nn.Dense(h, kernel_init=trunc_normal_02,
                     bias_init=nn.initializers.zeros,
                     dtype=self.compute_dtype, name="fc1")(x)
        x = exact_gelu(x)
        x = nn.Dense(d, kernel_init=trunc_normal_02,
                     bias_init=nn.initializers.zeros,
                     dtype=self.compute_dtype, name="fc2")(x)
        return x


class ViTImageNetBlock(nn.Module):
    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    num_tadapter: int = 1
    mlp_ratio: float = 4.0
    compute_dtype: Dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, dpr: jax.Array) -> Tuple[jax.Array, None]:
        deterministic = self.deterministic
        t = self.num_frames

        attn = CLIPAttention(self.num_heads, compute_dtype=self.compute_dtype,
                             name="attn")
        norm1 = LayerNormEps6(name="norm1")
        norm2 = LayerNormEps6(name="norm2")
        mlp = TimmMLP(self.mlp_ratio, compute_dtype=self.compute_dtype,
                      name="mlp")
        s_adapter = Adapter(compute_dtype=self.compute_dtype, name="S_Adapter")
        t_adapter = Adapter(skip_connect=False,
                            compute_dtype=self.compute_dtype, name="T_Adapter")
        mlp_adapter = Adapter(skip_connect=False,
                              compute_dtype=self.compute_dtype,
                              name="MLP_Adapter")

        rng = self.make_rng("dropout") if not deterministic else None
        rng_t, rng_m = (jax.random.split(rng) if rng is not None
                        else (None, None))

        # temporal adaptation (transpose-free, same as AIM)
        xt = norm1(x)
        if self.num_tadapter == 2:
            xt = Adapter(compute_dtype=self.compute_dtype,
                         name="T_Adapter_in")(xt)
        xt = t_adapter(attn(xt, temporal_frames=t))
        x = x + drop_path(rng_t, xt, dpr, deterministic)
        # spatial adaptation
        x = x + s_adapter(attn(norm1(x)))
        # joint adaptation
        xn = norm2(x)
        scale = jnp.asarray(self.adapter_scale, x.dtype)
        x = x + mlp(xn) + drop_path(rng_m, scale * mlp_adapter(xn), dpr,
                                    deterministic)
        return x, None


@BACKBONES.register_module()
class ViT_ImageNet(nn.Module):
    img_size: int = 224
    num_frames: int = 8
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    adapter_scale: float = 0.5
    num_tadapter: int = 1
    patch_embedding_bias: bool = True
    drop_path_rate: float = 0.1
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, c, t, h, w = x.shape
        if t != self.num_frames:
            raise ValueError(f"got T={t}, model built for num_frames={self.num_frames}")
        d = self.embed_dim
        cdt = self.compute_dtype
        n_patches = (self.img_size // self.patch_size) ** 2

        xt = x.transpose(0, 2, 3, 4, 1).reshape(b * t, h, w, c).astype(cdt)
        xt = nn.Conv(d, kernel_size=(self.patch_size, self.patch_size),
                     strides=(self.patch_size, self.patch_size),
                     use_bias=self.patch_embedding_bias, dtype=cdt,
                     kernel_init=trunc_normal_02, name="patch_embed")(xt)
        xt = xt.reshape(b * t, -1, d)

        cls_token = self.param("cls_token", trunc_normal_02, (1, 1, d),
                               jnp.float32)
        pos_embed = self.param("pos_embed", trunc_normal_02,
                               (1, n_patches + 1, d), jnp.float32)
        temporal_embedding = self.param("temporal_embedding",
                                        nn.initializers.zeros,
                                        (1, self.num_frames, d), jnp.float32)

        cls = jnp.broadcast_to(cls_token.astype(cdt), (b * t, 1, d))
        xt = jnp.concatenate([cls, xt], axis=1)
        xt = xt + pos_embed.astype(cdt)
        n = xt.shape[1]
        xt = xt.reshape(b, t, n, d).transpose(0, 2, 1, 3)
        xt = xt + temporal_embedding.astype(cdt)[None]
        xt = xt.transpose(0, 2, 1, 3).reshape(b * t, n, d)

        dpr = jnp.linspace(0.0, self.drop_path_rate, self.depth)
        ScanBlocks = nn.scan(
            ViTImageNetBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,), length=self.depth)
        xt, _ = ScanBlocks(
            num_heads=self.num_heads, num_frames=self.num_frames,
            adapter_scale=self.adapter_scale, num_tadapter=self.num_tadapter,
            mlp_ratio=self.mlp_ratio, compute_dtype=cdt,
            deterministic=deterministic, name="blocks")(xt, dpr)

        xt = LayerNormEps6(name="ln_post")(xt)
        return xt[:, 0].reshape(b, t, d)
