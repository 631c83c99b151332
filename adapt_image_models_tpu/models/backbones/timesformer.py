"""TimeSformer — divided space-time attention
(reference ``mmaction/models/backbones/timesformer.py:235``; the conceptual
ancestor of AIM's factorized temporal attention).

Divided ST block (the 'divided_space_time' mode the reference defaults to):
1. temporal: patch tokens attend over frames with a DEDICATED temporal
   attention + zero-init ``temporal_fc`` (so the block starts as the image
   model), residual into the patch tokens
2. spatial: the cls token is replicated per frame, frames attend spatially,
   the per-frame cls outputs are averaged back into one cls token
3. MLP.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.layers import (
    CLIPAttention, LayerNormFP32, exact_gelu, trunc_normal_02,
)

Dtype = jnp.dtype


class TimeSformerBlock(nn.Module):
    num_heads: int
    num_frames: int
    mlp_ratio: float = 4.0
    compute_dtype: Dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, dpr: jax.Array) -> Tuple[jax.Array, None]:
        # x: (B, 1 + T*N, D) — cls + all frame tokens flattened
        b, l, d = x.shape
        t = self.num_frames
        n = (l - 1) // t
        cdt = self.compute_dtype

        attn = CLIPAttention(self.num_heads, compute_dtype=cdt, name="attn")
        temporal_attn = CLIPAttention(self.num_heads, compute_dtype=cdt,
                                      name="temporal_attn")
        norm1 = LayerNormFP32(name="norm1")
        temporal_norm1 = LayerNormFP32(name="temporal_norm1")
        norm2 = LayerNormFP32(name="norm2")
        temporal_fc = nn.Dense(d, kernel_init=nn.initializers.zeros,
                               bias_init=nn.initializers.zeros, dtype=cdt,
                               name="temporal_fc")

        cls_tok, patches = x[:, :1], x[:, 1:]  # (B,1,D), (B,T*N,D)

        # 1. divided temporal attention (zero-init fc -> image model at init)
        pt = patches.reshape(b, t, n, d).transpose(0, 2, 1, 3).reshape(b * n, t, d)
        res_t = temporal_attn(temporal_norm1(pt))
        res_t = temporal_fc(res_t)
        res_t = res_t.reshape(b, n, t, d).transpose(0, 2, 1, 3).reshape(b, t * n, d)
        patches = patches + res_t.astype(patches.dtype)

        # 2. divided spatial attention with per-frame cls
        cls_rep = jnp.broadcast_to(cls_tok, (b, t, d)).reshape(b * t, 1, d)
        sp = patches.reshape(b * t, n, d)
        xs = jnp.concatenate([cls_rep, sp], axis=1)
        res_s = attn(norm1(xs))
        cls_out = res_s[:, 0].reshape(b, t, d).mean(axis=1, keepdims=True)
        patch_out = res_s[:, 1:].reshape(b, t * n, d)
        x = jnp.concatenate([cls_tok + cls_out.astype(x.dtype),
                             patches + patch_out.astype(x.dtype)], axis=1)

        # 3. MLP
        xn = norm2(x)
        h = nn.Dense(int(d * self.mlp_ratio), kernel_init=trunc_normal_02,
                     dtype=cdt, name="mlp_fc1")(xn)
        h = exact_gelu(h)
        h = nn.Dense(d, kernel_init=trunc_normal_02, dtype=cdt,
                     name="mlp_fc2")(h)
        return x + h.astype(x.dtype), None


@BACKBONES.register_module()
class TimeSformer(nn.Module):
    """Input (B, C, T, H, W) -> (B, 1, D) cls feature (the reference feeds a
    TimeSformerHead a single cls token; our I3DHead pools axis 1)."""

    num_frames: int = 8
    img_size: int = 224
    patch_size: int = 16
    embed_dims: int = 768
    num_heads: int = 12
    num_transformer_layers: int = 12
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, c, t, hh, ww = x.shape
        d = self.embed_dims
        cdt = self.compute_dtype
        n = (self.img_size // self.patch_size) ** 2

        xt = x.transpose(0, 2, 3, 4, 1).reshape(b * t, hh, ww, c).astype(cdt)
        xt = nn.Conv(d, (self.patch_size, self.patch_size),
                     (self.patch_size, self.patch_size), dtype=cdt,
                     kernel_init=trunc_normal_02, name="patch_embed")(xt)
        xt = xt.reshape(b * t, n, d)

        cls_token = self.param("cls_token", trunc_normal_02, (1, 1, d),
                               jnp.float32)
        pos_embed = self.param("pos_embed", trunc_normal_02, (1, n + 1, d),
                               jnp.float32)
        time_embed = self.param("time_embed", trunc_normal_02,
                                (1, self.num_frames, d), jnp.float32)

        cls = jnp.broadcast_to(cls_token.astype(cdt), (b * t, 1, d))
        xt = jnp.concatenate([cls, xt], axis=1) + pos_embed.astype(cdt)
        # keep one cls per video; add time embedding to patches
        cls_tok = xt[:, :1].reshape(b, t, d)[:, :1]  # (B, 1, D)
        patches = xt[:, 1:].reshape(b, t, n, d)
        patches = patches + time_embed.astype(cdt)[:, :, None, :]
        x_seq = jnp.concatenate([cls_tok, patches.reshape(b, t * n, d)], axis=1)

        dpr = jnp.linspace(0.0, 0.1, self.num_transformer_layers)
        ScanBlocks = nn.scan(
            TimeSformerBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,), length=self.num_transformer_layers)
        x_seq, _ = ScanBlocks(num_heads=self.num_heads,
                              num_frames=self.num_frames,
                              compute_dtype=cdt,
                              deterministic=deterministic,
                              name="blocks")(x_seq, dpr)

        x_seq = LayerNormFP32(name="norm")(x_seq)
        return x_seq[:, :1]  # (B, 1, D)
