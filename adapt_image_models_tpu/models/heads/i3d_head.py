"""I3D classification head (reference ``mmaction/models/heads/i3d_head.py:9``).

Reference: AdaptiveAvgPool3d((1,1,1)) -> Dropout(0.5) -> Linear(D, C), with
normal(std=0.01) weight init. Our backbone emits ``(B, T, D)`` per-frame
features (spatial dims already reduced to the class token), so the pool is a
mean over T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS


@HEADS.register_module()
class I3DHead(nn.Module):
    num_classes: int
    in_channels: int
    dropout_ratio: float = 0.5
    init_std: float = 0.01
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # AdaptiveAvgPool3d((1,1,1)) analog: pool every non-(batch, channel)
        # axis. Accepts (B, T, D) from ViT backbones or (B, T, H, W, D)
        # feature maps from hierarchical backbones (Swin).
        x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio)(x, deterministic=deterministic)
        # classification logits in fp32 for a stable softmax/loss
        x = x.astype(jnp.float32)
        logits = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=self.init_std),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32, name="fc_cls")(x)
        return logits
