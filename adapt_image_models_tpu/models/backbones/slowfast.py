"""ResNet3dSlowFast (reference ``mmaction/models/backbones/resnet3d_slowfast.py``,
520 LoC) and X3D (reference ``x3d.py``, 523 LoC).

SlowFast: two ResNet3d pathways — Slow (low frame rate, high channels) and
Fast (high frame rate, 1/8 channels) — with lateral time-strided-conv
connections from Fast into Slow after the stem and each of the first three
stages. Speed ratio alpha (default 8) relates the pathways' frame rates;
channel ratio beta_inv (default 8) their widths.

X3D: MobileNet-style expanded 3D bottlenecks (depthwise spatial conv +
squeeze-excite every other block, swish) with width/depth expansion factors.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.backbones.resnet3d import Bottleneck3d

Dtype = jnp.dtype


class _Pathway(nn.Module):
    """One SlowFast ResNet3d pathway with optional lateral inputs."""

    base_channels: int
    stage_blocks: Sequence[int]
    inflate: Sequence[int]
    name_prefix: str = ""
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, laterals=None, deterministic: bool = True):
        cdt = self.compute_dtype
        c0 = self.base_channels
        h = nn.Conv(c0, (1, 7, 7), (1, 2, 2), use_bias=False, dtype=cdt,
                    name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        h = nn.max_pool(h, (1, 3, 3), (1, 2, 2), padding="SAME")
        outs = [h]  # stem output first (feeds the stem lateral)
        planes = c0
        for i, n_blocks in enumerate(self.stage_blocks):
            if laterals is not None and i < len(laterals) and laterals[i] is not None:
                h = jnp.concatenate([h, laterals[i]], axis=-1)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = Bottleneck3d(planes, spatial_stride=stride,
                                 inflate=bool(self.inflate[i]),
                                 compute_dtype=cdt,
                                 name=f"layer{i + 1}_{j}")(
                                     h, deterministic=deterministic)
            outs.append(h)
            planes *= 2
        return h, outs


@BACKBONES.register_module()
class ResNet3dSlowFast(nn.Module):
    """Input (B, C, T, H, W); T must be divisible by alpha.

    Returns (slow_feat, fast_feat) channels-last feature maps — feed
    :class:`SlowFastHead` (it concatenates pooled pathways).
    """

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    # per-pathway depth overrides (reference slowfast_r101_r50 /
    # slowfast_r152_r50 recipes pair a deeper slow pathway with an R50
    # fast pathway, configs/recognition/slowfast/); None -> stage_blocks
    slow_stage_blocks: Optional[Sequence[int]] = None
    fast_stage_blocks: Optional[Sequence[int]] = None
    alpha: int = 8          # fast/slow frame-rate ratio
    beta_inv: int = 8       # slow/fast channel ratio
    base_channels: int = 64
    fusion_kernel: int = 5
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        cdt = self.compute_dtype
        xt = x.transpose(0, 2, 3, 4, 1).astype(cdt)  # NTHWC
        t = xt.shape[1]
        if t % self.alpha:
            raise ValueError(f"T={t} not divisible by alpha={self.alpha}")

        fast_in = xt
        slow_in = xt[:, ::self.alpha]

        c_fast = self.base_channels // self.beta_inv

        # fast pathway first: its stage outputs feed the laterals
        fast_out, fast_stages = _Pathway(
            c_fast, self.fast_stage_blocks or self.stage_blocks,
            inflate=(1, 1, 1, 1),
            compute_dtype=cdt, name="fast_path")(
                fast_in, deterministic=deterministic)

        # lateral connections: time-strided conv from fast -> slow
        def lateral(feat, idx):
            ch = feat.shape[-1] * 2
            out = nn.Conv(ch, (self.fusion_kernel, 1, 1),
                          (self.alpha, 1, 1), use_bias=False, dtype=cdt,
                          name=f"lateral_{idx}")(feat)
            return nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                        momentum=0.9,
                                        name=f"lateral_bn_{idx}")(out))

        # laterals from fast stem + stages 1..3 into slow stages 1..4
        # (reference fuses at conv1 and after res2/res3/res4)
        laterals = [lateral(fast_stages[i], i) for i in range(4)]

        slow_out, _ = _Pathway(
            self.base_channels, self.slow_stage_blocks or self.stage_blocks,
            inflate=(0, 0, 1, 1),
            compute_dtype=cdt, name="slow_path")(
                slow_in, laterals=laterals, deterministic=deterministic)

        return slow_out.astype(jnp.float32), fast_out.astype(jnp.float32)


class _SE(nn.Module):
    ratio: float = 1 / 16
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.relu(nn.Dense(max(1, int(c * self.ratio)),
                             dtype=self.compute_dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(c, dtype=self.compute_dtype,
                                    name="fc2")(s))
        return x * s


class X3DBlock(nn.Module):
    planes_mid: int
    planes_out: int
    spatial_stride: int = 1
    use_se: bool = False
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        identity = x
        h = nn.Conv(self.planes_mid, (1, 1, 1), use_bias=False, dtype=cdt,
                    name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        s = self.spatial_stride
        # depthwise 3x3x3
        h = nn.Conv(self.planes_mid, (3, 3, 3), (1, s, s), use_bias=False,
                    feature_group_count=self.planes_mid, dtype=cdt,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn2")(h)
        if self.use_se:
            h = _SE(compute_dtype=cdt, name="se")(h)
        h = jax.nn.swish(h)
        h = nn.Conv(self.planes_out, (1, 1, 1), use_bias=False, dtype=cdt,
                    name="conv3")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn3")(h)
        if identity.shape != h.shape:
            identity = nn.Conv(self.planes_out, (1, 1, 1), (1, s, s),
                               use_bias=False, dtype=cdt,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=deterministic,
                                    momentum=0.9,
                                    name="downsample_bn")(identity)
        return nn.relu(h + identity)


@BACKBONES.register_module()
class X3D(nn.Module):
    """X3D-M-ish (reference ``x3d.py``): gamma_w/gamma_b/gamma_d expansion.

    Input (B, C, T, H, W) -> (B, T, H', W', C_out) feature map.
    """

    gamma_w: float = 1.0
    gamma_b: float = 2.25
    gamma_d: float = 2.2
    base_channels: int = 24
    stage_blocks: Sequence[int] = (1, 2, 5, 3)
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        import math
        cdt = self.compute_dtype
        h = x.transpose(0, 2, 3, 4, 1).astype(cdt)

        def round_width(w, mult, divisor=8):
            w = w * mult
            return int(max(divisor, (w + divisor / 2) // divisor * divisor))

        c0 = round_width(self.base_channels, self.gamma_w)
        # stem: spatial then depthwise temporal conv
        h = nn.Conv(c0, (1, 3, 3), (1, 2, 2), use_bias=False, dtype=cdt,
                    name="conv1_s")(h)
        h = nn.Conv(c0, (5, 1, 1), use_bias=False, feature_group_count=c0,
                    dtype=cdt, name="conv1_t")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))

        planes = c0
        blk_idx = 0
        for i, depth_base in enumerate(self.stage_blocks):
            depth = int(math.ceil(depth_base * self.gamma_d))
            out_ch = planes * 2 if i > 0 else planes
            mid = int(out_ch * self.gamma_b)
            for j in range(depth):
                h = X3DBlock(mid, out_ch,
                             spatial_stride=2 if j == 0 else 1,
                             use_se=(blk_idx % 2 == 0),
                             compute_dtype=cdt,
                             name=f"stage{i + 1}_block{j}")(
                                 h, deterministic=deterministic)
                blk_idx += 1
            planes = out_ch
        # conv5 expansion
        h = nn.Conv(int(planes * self.gamma_b), (1, 1, 1), use_bias=False,
                    dtype=cdt, name="conv5")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn5")(h))
        return h.astype(jnp.float32)
