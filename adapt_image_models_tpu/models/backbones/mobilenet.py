"""MobileNetV2 / MobileNetV2TSM / TANet / ResNet2Plus1d backbones
(reference ``mmaction/models/backbones/mobilenet_v2.py`` (297 LoC),
``mobilenet_v2_tsm.py``, ``tanet.py`` (114 LoC), ``resnet2plus1d.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.backbones.resnet import (
    ResNet, temporal_shift, ARCH_SETTINGS, Bottleneck, BasicBlock,
)
from adapt_image_models_tpu.models.common import Conv2plus1d, TAM

Dtype = jnp.dtype

# (expand_ratio, out_channels, num_blocks, stride) — MobileNetV2 arch
MBV2_ARCH = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    tsm_frames: Optional[int] = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.out_channels
        h = x
        if use_res and self.tsm_frames:
            # TSM shifts inside residual blocks (mobilenet_v2_tsm.py)
            h = temporal_shift(h, self.tsm_frames)
        if self.expand_ratio != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, dtype=cdt,
                        name="expand")(h)
            h = nn.relu6(nn.BatchNorm(use_running_average=deterministic,
                                      momentum=0.9, name="expand_bn")(h))
        h = nn.Conv(hidden, (3, 3), (self.stride, self.stride),
                    feature_group_count=hidden, use_bias=False, dtype=cdt,
                    name="dw")(h)
        h = nn.relu6(nn.BatchNorm(use_running_average=deterministic,
                                  momentum=0.9, name="dw_bn")(h))
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=cdt,
                    name="project")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="project_bn")(h)
        return x + h if use_res else h


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    """Input (B*S, C, H, W) -> pooled (B*S, 1280)."""

    num_frames: Optional[int] = None  # set -> TSM variant
    widen_factor: float = 1.0
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 1).astype(cdt)
        c0 = int(32 * self.widen_factor)
        h = nn.Conv(c0, (3, 3), (2, 2), use_bias=False, dtype=cdt,
                    name="conv1")(h)
        h = nn.relu6(nn.BatchNorm(use_running_average=deterministic,
                                  momentum=0.9, name="bn1")(h))
        for i, (t_exp, c, n, s) in enumerate(MBV2_ARCH):
            ch = int(c * self.widen_factor)
            for j in range(n):
                h = InvertedResidual(ch, stride=s if j == 0 else 1,
                                     expand_ratio=t_exp,
                                     tsm_frames=self.num_frames,
                                     compute_dtype=cdt,
                                     name=f"layer{i + 1}_{j}")(
                                         h, deterministic=deterministic)
        h = nn.Conv(int(1280 * max(1.0, self.widen_factor)), (1, 1),
                    use_bias=False, dtype=cdt, name="conv_last")(h)
        h = nn.relu6(nn.BatchNorm(use_running_average=deterministic,
                                  momentum=0.9, name="bn_last")(h))
        return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)


@BACKBONES.register_module()
class MobileNetV2TSM(MobileNetV2):
    def __call__(self, x, deterministic: bool = True):
        if self.num_frames is None:
            raise ValueError("MobileNetV2TSM requires num_frames")
        return super().__call__(x, deterministic=deterministic)


class TABlock(nn.Module):
    """Bottleneck with a TAM after conv1 (reference ``tanet.py``: TAM wraps
    the block's first conv output)."""

    planes: int
    num_segments: int
    stride: int = 1
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=cdt,
                    name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        h = TAM(self.num_segments, compute_dtype=cdt, name="tam")(
            h, deterministic=deterministic)
        h = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    use_bias=False, dtype=cdt, name="conv2")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn2")(h))
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=cdt,
                    name="conv3")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn3")(h)
        if identity.shape != h.shape:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=cdt, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=deterministic,
                                    momentum=0.9,
                                    name="downsample_bn")(identity)
        return nn.relu(h + identity)


@BACKBONES.register_module()
class TANet(nn.Module):
    """ResNet-50 skeleton with TAM blocks (reference ``tanet.py:114``)."""

    depth: int = 50
    num_segments: int = 8
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kind, stage_blocks = ARCH_SETTINGS[self.depth]
        if kind != "bottleneck":
            raise ValueError("TANet requires a bottleneck ResNet (50/101/152)")
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 1).astype(cdt)
        h = nn.Conv(64, (7, 7), (2, 2), use_bias=False, dtype=cdt,
                    name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding="SAME")
        planes = 64
        for i, n_blocks in enumerate(stage_blocks):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = TABlock(planes, self.num_segments, stride=stride,
                            compute_dtype=cdt, name=f"layer{i + 1}_{j}")(
                                h, deterministic=deterministic)
            planes *= 2
        return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)


class Block2Plus1d(nn.Module):
    planes: int
    spatial_stride: int = 1
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        identity = x
        s = self.spatial_stride
        h = Conv2plus1d(self.planes, (3, 3, 3), (1, s, s), compute_dtype=cdt,
                        name="conv1")(x, deterministic=deterministic)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        h = Conv2plus1d(self.planes, (3, 3, 3), compute_dtype=cdt,
                        name="conv2")(h, deterministic=deterministic)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn2")(h)
        if identity.shape != h.shape:
            identity = nn.Conv(self.planes, (1, 1, 1), (1, s, s),
                               use_bias=False, dtype=cdt,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=deterministic,
                                    momentum=0.9,
                                    name="downsample_bn")(identity)
        return nn.relu(h + identity)


@BACKBONES.register_module()
class ResNet2Plus1d(nn.Module):
    """R(2+1)D (reference ``resnet2plus1d.py``): factorized 3D convs.
    Input (B, C, T, H, W) -> (B, T, H', W', C_out)."""

    stage_blocks: Optional[Sequence[int]] = None
    depth: int = 18  # 18 -> (2,2,2,2), 34 -> (3,4,6,3) basic blocks
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 4, 1).astype(cdt)
        h = Conv2plus1d(64, (3, 7, 7), (1, 2, 2), compute_dtype=cdt,
                        name="stem")(h, deterministic=deterministic)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        planes = 64
        stage_blocks = self.stage_blocks or {18: (2, 2, 2, 2),
                                              34: (3, 4, 6, 3)}[self.depth]
        for i, n_blocks in enumerate(stage_blocks):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = Block2Plus1d(planes, spatial_stride=stride,
                                 compute_dtype=cdt,
                                 name=f"layer{i + 1}_{j}")(
                                     h, deterministic=deterministic)
            planes *= 2
        return h.astype(jnp.float32)
