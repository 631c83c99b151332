"""3D CNN backbones: ResNet3d / SlowOnly and C3D
(reference ``mmaction/models/backbones/resnet3d.py`` (1023 LoC),
``resnet3d_slowonly.py``, ``c3d.py`` (139 LoC)).

SlowOnly-R50 pathway config (the mmaction default): (1,7,7) stem, no
temporal downsampling, temporal conv kernel 3 only in the last two stages
(``inflate`` pattern (0, 0, 1, 1)).

Backbones return channels-last (B, T', H', W', C) feature maps for the
generalized I3DHead; C3D returns fc-pooled (B, 4096) features.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES

Dtype = jnp.dtype


class Bottleneck3d(nn.Module):
    planes: int
    spatial_stride: int = 1
    temporal_kernel: int = 1  # 1 or 3 (the "inflate" switch)
    # 'ir' = interaction-reduced CSN: the 3x3x3 conv becomes depthwise
    # (reference ``resnet3d_csn.py``)
    csn_mode: str = ""
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        identity = x
        tk = self.temporal_kernel
        h = nn.Conv(self.planes, (tk, 1, 1), use_bias=False, dtype=cdt,
                    name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        s = self.spatial_stride
        if self.csn_mode == "ir":
            h = nn.Conv(self.planes, (3, 3, 3), (1, s, s), use_bias=False,
                        feature_group_count=self.planes, dtype=cdt,
                        name="conv2")(h)
        else:
            h = nn.Conv(self.planes, (1, 3, 3), (1, s, s), use_bias=False,
                        dtype=cdt, name="conv2")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn2")(h))
        h = nn.Conv(self.planes * 4, (1, 1, 1), use_bias=False, dtype=cdt,
                    name="conv3")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn3")(h)
        if identity.shape != h.shape:
            identity = nn.Conv(self.planes * 4, (1, 1, 1), (1, s, s),
                               use_bias=False, dtype=cdt,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=deterministic,
                                    momentum=0.9, name="downsample_bn")(identity)
        return nn.relu(h + identity)


@BACKBONES.register_module()
class ResNet3dSlowOnly(nn.Module):
    """SlowOnly pathway (reference ``resnet3d_slowonly.py``). Input
    (B, C, T, H, W) -> (B, T', H', W', 2048)."""

    depth: int = 50
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    inflate: Sequence[int] = (0, 0, 1, 1)
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 4, 1).astype(cdt)  # NCTHW -> NTHWC
        h = nn.Conv(64, (1, 7, 7), (1, 2, 2), use_bias=False, dtype=cdt,
                    name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        h = nn.max_pool(h, (1, 3, 3), (1, 2, 2), padding="SAME")

        planes = 64
        for i, n_blocks in enumerate(self.stage_blocks):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = Bottleneck3d(planes, spatial_stride=stride,
                                 temporal_kernel=3 if self.inflate[i] else 1,
                                 compute_dtype=cdt,
                                 name=f"layer{i + 1}_{j}")(
                                     h, deterministic=deterministic)
            planes *= 2
        return h.astype(jnp.float32)


@BACKBONES.register_module()
class ResNet3d(ResNet3dSlowOnly):
    """Inflated-3D ResNet (reference ``resnet3d.py``); SlowOnly with full
    inflation by default."""

    inflate: Sequence[int] = (1, 1, 1, 1)


@BACKBONES.register_module()
class ResNet3dCSN(ResNet3dSlowOnly):
    """Channel-separated 3D ResNet (reference ``resnet3d_csn.py``, ir mode:
    bottlenecks with depthwise 3x3x3 convs)."""

    inflate: Sequence[int] = (1, 1, 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 4, 1).astype(cdt)
        h = nn.Conv(64, (3, 7, 7), (1, 2, 2), use_bias=False, dtype=cdt,
                    name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        h = nn.max_pool(h, (1, 3, 3), (1, 2, 2), padding="SAME")
        planes = 64
        for i, n_blocks in enumerate(self.stage_blocks):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = Bottleneck3d(planes, spatial_stride=stride,
                                 temporal_kernel=3 if self.inflate[i] else 1,
                                 csn_mode="ir", compute_dtype=cdt,
                                 name=f"layer{i + 1}_{j}")(
                                     h, deterministic=deterministic)
            planes *= 2
        return h.astype(jnp.float32)


@BACKBONES.register_module()
class ResNetAudio(nn.Module):
    """Audio spectrogram ResNet (reference ``resnet_audio.py``, 373 LoC):
    conv stem over (frames, mels) + 2D ResNet stages -> pooled features."""

    depth: int = 50
    base_channels: int = 32
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from adapt_image_models_tpu.models.backbones.resnet import (
            ARCH_SETTINGS, Bottleneck, BasicBlock,
        )
        kind, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        cdt = self.compute_dtype
        # x: (B*S, 1, frames, mels) NCHW
        h = x.transpose(0, 2, 3, 1).astype(cdt)
        h = nn.Conv(self.base_channels, (9, 1), (1, 1), use_bias=False,
                    dtype=cdt, name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        planes = self.base_channels
        for i, n_blocks in enumerate(stage_blocks):
            for j in range(n_blocks):
                stride = 2 if j == 0 else 1
                h = block_cls(planes, stride=stride, compute_dtype=cdt,
                              name=f"layer{i + 1}_{j}")(
                                  h, deterministic=deterministic)
            planes *= 2
        return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)


@BACKBONES.register_module()
class C3D(nn.Module):
    """C3D (reference ``c3d.py:139``): 8 conv3d + 5 pools + fc6/fc7.
    Expects 16x112x112 clips; returns (B, 4096)."""

    compute_dtype: Dtype = jnp.float32
    dropout_ratio: float = 0.5
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 4, 1).astype(cdt)

        def conv(h, ch, name):
            h = nn.Conv(ch, (3, 3, 3), dtype=cdt, name=name)(h)
            return nn.relu(h)

        h = conv(h, 64, "conv1a")
        h = nn.max_pool(h, (1, 2, 2), (1, 2, 2))
        h = conv(h, 128, "conv2a")
        h = nn.max_pool(h, (2, 2, 2), (2, 2, 2))
        h = conv(h, 256, "conv3a")
        h = conv(h, 256, "conv3b")
        h = nn.max_pool(h, (2, 2, 2), (2, 2, 2))
        h = conv(h, 512, "conv4a")
        h = conv(h, 512, "conv4b")
        h = nn.max_pool(h, (2, 2, 2), (2, 2, 2))
        h = conv(h, 512, "conv5a")
        h = conv(h, 512, "conv5b")
        h = nn.max_pool(h, (2, 2, 2), (2, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(4096, dtype=cdt, name="fc6")(h))
        h = nn.Dropout(self.dropout_ratio)(h, deterministic=deterministic)
        h = nn.relu(nn.Dense(4096, dtype=cdt, name="fc7")(h))
        return h.astype(jnp.float32)
