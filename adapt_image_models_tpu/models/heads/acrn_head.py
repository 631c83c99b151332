"""ACRN actor-centric relation head (reference
``mmaction/models/heads/misc_head.py:15`` — "Actor-Centric Relation
Network", Sun et al. 2018).

Sits between the RoI extractor and the AVA bbox head: each actor's pooled
RoI feature is tiled over the full-scene feature map, concatenated with it
channel-wise, and mixed by 1x1 + (1,3,3) convolutions — producing a
relation feature map per actor that the bbox head pools and classifies.

TPU-native shape notes: the reference indexes a flat roi list into its
feature batch (``feat[roi_inds]``); here rois are already batched
(B, R, 4) with a static R, so the tile+concat is a pure broadcast and the
convs run on a (B*R, T, H, W, C) layout that XLA tiles onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS

Dtype = jnp.dtype


@HEADS.register_module()
class ACRNHead(nn.Module):
    in_channels: int = 4096   # roi C + context C after concat
    out_channels: int = 2048
    stride: int = 1
    num_convs: int = 1
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feat: jax.Array, feat: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """roi_feat: (B, R, O, O, C_r) pooled actor features;
        feat: (B, T, H, W, C_f) scene feature map
        -> (B, R, T, H//stride, W//stride, out_channels)."""
        cdt = self.compute_dtype
        b, r = roi_feat.shape[:2]
        t, h, w = feat.shape[1:4]

        # actor descriptor: global max-pool over the roi window
        actor = roi_feat.max(axis=(2, 3))                       # (B, R, C_r)
        actor = jnp.broadcast_to(
            actor[:, :, None, None, None, :],
            (b, r, t, h, w, actor.shape[-1]))
        scene = jnp.broadcast_to(feat[:, None],
                                 (b, r, t, h, w, feat.shape[-1]))
        x = jnp.concatenate([actor, scene], axis=-1).astype(cdt)
        x = x.reshape(b * r, t, h, w, -1)

        def conv_bn_relu(x, features, kernel, strides, name):
            x = nn.Conv(features, kernel, strides, use_bias=False,
                        dtype=cdt, kernel_init=nn.initializers.he_normal(),
                        name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             dtype=jnp.float32, name=f"{name}_bn")(x)
            return nn.relu(x)

        x = conv_bn_relu(x, self.out_channels, (1, 1, 1), (1, 1, 1), "conv1")
        x = conv_bn_relu(x, self.out_channels, (1, 3, 3),
                         (1, self.stride, self.stride), "conv2")
        for i in range(self.num_convs - 1):
            x = conv_bn_relu(x, self.out_channels, (1, 3, 3), (1, 1, 1),
                             f"conv{i + 3}")
        return x.reshape(b, r, *x.shape[1:]).astype(jnp.float32)
