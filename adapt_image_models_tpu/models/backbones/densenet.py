"""DenseNet 2D backbone.

Parity: the reference's TSN custom-backbone recipe instantiates
``torchvision.densenet161`` through the torchvision source hook
(``mmaction/models/recognizers/base.py:42-58``;
``configs/recognition/tsn/custom_backbones/tsn_dense161_320p_1x1x3_100e_kinetics400_rgb.py``)
and strips its classifier, leaving the 2208-channel feature trunk.

TPU-native design: a flax implementation of the torchvision DenseNet
feature trunk (BN-ReLU-Conv "pre-activation" dense layers, concat growth,
half-width transitions). Channel-concat chains are pure layout ops under
XLA; all FLOPs land in the 1x1/3x3 convs on the MXU. Follows the
Recognizer2D contract: input ``(B*S, C, H, W)`` NCHW -> pooled
``(B*S, C_out)``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES

Dtype = jnp.dtype

# torchvision arch table: (growth_rate, block_config, num_init_features)
ARCH_SETTINGS = {
    121: (32, (6, 12, 24, 16), 64),
    161: (48, (6, 12, 36, 24), 96),
    169: (32, (6, 12, 32, 32), 64),
    201: (32, (6, 12, 48, 32), 64),
}


class DenseLayer(nn.Module):
    """BN-ReLU-1x1(bn_size*k) -> BN-ReLU-3x3(k); output is concatenated onto
    the running feature map by the caller."""

    growth_rate: int
    bn_size: int = 4
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="norm1")(x))
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=cdt, name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="norm2")(h))
        return nn.Conv(self.growth_rate, (3, 3), use_bias=False, dtype=cdt,
                       name="conv2")(h)


@BACKBONES.register_module()
class DenseNet(nn.Module):
    """DenseNet feature trunk (default: densenet161, 2208-dim features)."""

    depth: int = 161
    bn_size: int = 4
    # per-stage layer-count override for tiny test geometries (TPU-build
    # extension, mirrors ResNet.stage_blocks)
    stage_blocks: Optional[Sequence[int]] = None
    spatial_pool: bool = True
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.depth not in ARCH_SETTINGS:
            raise KeyError(f"unsupported DenseNet depth {self.depth}; "
                           f"known: {sorted(ARCH_SETTINGS)}")
        growth, block_config, init_feats = ARCH_SETTINGS[self.depth]
        if self.stage_blocks is not None:
            block_config = tuple(self.stage_blocks)
        cdt = self.compute_dtype

        h = x.transpose(0, 2, 3, 1).astype(cdt)  # NCHW -> NHWC
        h = nn.Conv(init_feats, (7, 7), (2, 2), use_bias=False, dtype=cdt,
                    name="conv0")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="norm0")(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding="SAME")

        num_feats = init_feats
        for i, n_layers in enumerate(block_config):
            for j in range(n_layers):
                new = DenseLayer(growth, bn_size=self.bn_size,
                                 compute_dtype=cdt,
                                 name=f"denseblock{i + 1}_layer{j + 1}")(
                                     h, deterministic=deterministic)
                h = jnp.concatenate([h, new], axis=-1)
            num_feats += n_layers * growth
            if i != len(block_config) - 1:
                h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                         momentum=0.9,
                                         name=f"transition{i + 1}_norm")(h))
                num_feats //= 2
                h = nn.Conv(num_feats, (1, 1), use_bias=False, dtype=cdt,
                            name=f"transition{i + 1}_conv")(h)
                h = nn.avg_pool(h, (2, 2), (2, 2))
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="norm5")(h))
        if self.spatial_pool:
            return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        return h.astype(jnp.float32)
