"""ResNetTIN — Temporal Interlace Network
(reference ``mmaction/models/backbones/resnet_tin.py``, 378 LoC).

TIN replaces TSM's fixed ±1 shifts with LEARNED fractional offsets: a small
offset net predicts a per-group temporal displacement (applied by linear
interpolation between neighboring frames, zero-padded at the ends) and a
weight net predicts per-segment gates. Only the first 1/``shift_div`` of the
channels are interlaced, mirroring TSM's partial-shift design.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.backbones.resnet import (
    ResNet, ARCH_SETTINGS, BasicBlock, Bottleneck,
)

Dtype = jnp.dtype


class TemporalInterlace(nn.Module):
    """x: (B*T, H, W, C) -> fractionally-shifted first C/shift_div channels."""

    num_segments: int
    shift_div: int = 4
    offset_groups: int = 2
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        bt, hh, ww, c = x.shape
        t = self.num_segments
        b = bt // t
        fold = c // self.shift_div

        xt = x.reshape(b, t, hh, ww, c)
        part = xt[..., :fold]  # (B, T, H, W, fold)

        # descriptor: (B, T, fold) -> offset & weight nets (reference's
        # CombineNet = offset fc + weight conv over the temporal axis)
        desc = part.mean(axis=(2, 3))  # (B, T, fold)
        o = nn.relu(nn.Dense(fold // 4, dtype=cdt, name="offset_fc1")(
            desc.reshape(b, -1)))
        offsets = nn.Dense(self.offset_groups, dtype=cdt,
                           name="offset_fc2")(o)
        # bounded offsets (reference: 4 * (sigmoid - 0.5) -> [-2, 2])
        offsets = 4.0 * (jax.nn.sigmoid(offsets) - 0.5)  # (B, G)

        wgt = nn.Conv(1, (3,), padding="SAME", dtype=cdt,
                      name="weight_conv")(desc)  # (B, T, 1)
        weights = 2.0 * jax.nn.sigmoid(wgt)  # reference doubles the gate

        # fractional shift by linear interpolation with zero padding
        group_size = fold // self.offset_groups
        tpad = jnp.pad(part, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        tidx = jnp.arange(t)
        shifted_groups = []
        for g in range(self.offset_groups):
            off = offsets[:, g]  # (B,)
            pos = tidx[None, :].astype(jnp.float32) + off[:, None]  # (B, T)
            lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), -1, t)
            frac = (pos - lo.astype(jnp.float32))[:, :, None, None, None]
            seg = tpad[..., g * group_size:(g + 1) * group_size]
            lo_idx = jnp.clip(lo + 1, 0, t + 1)
            hi_idx = jnp.clip(lo + 2, 0, t + 1)
            g_lo = jnp.take_along_axis(
                seg, lo_idx[:, :, None, None, None].repeat(hh, 2)
                .repeat(ww, 3).repeat(group_size, 4), axis=1)
            g_hi = jnp.take_along_axis(
                seg, hi_idx[:, :, None, None, None].repeat(hh, 2)
                .repeat(ww, 3).repeat(group_size, 4), axis=1)
            shifted_groups.append(g_lo * (1 - frac) + g_hi * frac)
        shifted = jnp.concatenate(shifted_groups, axis=-1)
        shifted = shifted * weights[:, :, None, None, :]

        out = jnp.concatenate([shifted.astype(x.dtype), xt[..., fold:]],
                              axis=-1)
        return out.reshape(bt, hh, ww, c)


class TINBlock(nn.Module):
    planes: int
    num_segments: int
    stride: int = 1
    kind: str = "bottleneck"
    shift_div: int = 4
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = TemporalInterlace(self.num_segments,
                              shift_div=self.shift_div,
                              compute_dtype=self.compute_dtype,
                              name="tin")(x, deterministic=deterministic)
        block = (Bottleneck if self.kind == "bottleneck" else BasicBlock)(
            self.planes, stride=self.stride,
            compute_dtype=self.compute_dtype, name="block")
        # the interlace feeds the residual branch; identity stays unshifted
        # (reference wraps the block's conv1 input)
        return block(h, deterministic=deterministic)


@BACKBONES.register_module()
class ResNetTIN(nn.Module):
    depth: int = 50
    num_segments: int = 8
    # fraction of channels interlaced = 1/shift_div (reference
    # resnet_tin.py shift_div, default 4)
    shift_div: int = 4
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kind, stage_blocks = ARCH_SETTINGS[self.depth]
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
                h = TINBlock(planes, self.num_segments, stride=stride,
                             kind=kind, shift_div=self.shift_div,
                             compute_dtype=cdt,
                             name=f"layer{i + 1}_{j}")(
                                 h, deterministic=deterministic)
            planes *= 2
        return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
