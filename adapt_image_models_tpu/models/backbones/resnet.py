"""ResNet + ResNetTSM backbones
(reference ``mmaction/models/backbones/resnet.py`` (590 LoC) and
``resnet_tsm.py`` (294 LoC, Temporal Shift Module)).

TSM (``resnet_tsm.py``): before each residual block's first conv, 1/8 of the
channels are shifted one frame forward and 1/8 one frame backward along T —
zero-FLOP temporal mixing, a pure ``jnp.roll``+mask on TPU (residual-style
shift, the mmaction default).

Backbones return globally-pooled per-frame features ``(B*S, C)`` for the
TSN/TSM 2D-recognizer path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES

Dtype = jnp.dtype

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def temporal_shift(x: jax.Array, num_frames: int, shift_div: int = 8) -> jax.Array:
    """TSM shift (reference ``resnet_tsm.py`` TemporalShift.shift): first
    C/div channels roll +1 frame, next C/div roll -1, rest unchanged.
    x: (B*T, H, W, C)."""
    bt = x.shape[0]
    b = bt // num_frames
    xt = x.reshape((b, num_frames) + x.shape[1:])
    c = x.shape[-1]
    fold = c // shift_div
    left = jnp.roll(xt[..., :fold], -1, axis=1)
    # zero the wrapped frame (mmaction shifts with zero padding, not circular)
    tmask = (jnp.arange(num_frames) < num_frames - 1)
    left = left * tmask[None, :, None, None, None].astype(left.dtype)
    right = jnp.roll(xt[..., fold:2 * fold], 1, axis=1)
    tmask2 = (jnp.arange(num_frames) > 0)
    right = right * tmask2[None, :, None, None, None].astype(right.dtype)
    out = jnp.concatenate([left, right, xt[..., 2 * fold:]], axis=-1)
    return out.reshape(x.shape)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    tsm_frames: Optional[int] = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        identity = x
        h = x
        if self.tsm_frames:
            h = temporal_shift(h, self.tsm_frames)
        h = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    use_bias=False, dtype=cdt, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), use_bias=False, dtype=cdt,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn2")(h)
        if identity.shape != h.shape:
            identity = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=cdt, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=deterministic,
                                    momentum=0.9, name="downsample_bn")(identity)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    tsm_frames: Optional[int] = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        identity = x
        h = x
        if self.tsm_frames:
            h = temporal_shift(h, self.tsm_frames)
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=cdt,
                    name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
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
                                    momentum=0.9, name="downsample_bn")(identity)
        return nn.relu(h + identity)


@BACKBONES.register_module()
class ResNet(nn.Module):
    """2D ResNet over per-frame images. Input (B*S, C, H, W) NCHW (the
    Recognizer2D contract) -> pooled (B*S, C_out)."""

    depth: int = 50
    num_frames: Optional[int] = None  # set -> TSM shifts in every block
    spatial_pool: bool = True
    # multi-entry -> tuple of those stage feature maps (NHWC), the reference
    # TPN-TSM recipe's out_indices=(2, 3) (resnet.py forward/out_indices)
    out_indices: Sequence[int] = ()
    # per-stage block-count override (mirrors resnet3d's stage_blocks; the
    # reference 2D ResNet derives counts from depth only — this TPU-build
    # extension exists for tiny test/bench geometries)
    stage_blocks: Optional[Sequence[int]] = None
    compute_dtype: Dtype = jnp.float32
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.depth not in ARCH_SETTINGS:
            raise KeyError(f"unsupported ResNet depth {self.depth}")
        kind, stage_blocks = ARCH_SETTINGS[self.depth]
        if self.stage_blocks is not None:
            stage_blocks = tuple(self.stage_blocks)
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        cdt = self.compute_dtype

        h = x.transpose(0, 2, 3, 1).astype(cdt)  # NCHW -> NHWC
        h = nn.Conv(64, (7, 7), (2, 2), use_bias=False, dtype=cdt,
                    name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding="SAME")

        planes = 64
        stage_outs = []
        for i, n_blocks in enumerate(stage_blocks):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = block_cls(planes, stride=stride,
                              tsm_frames=self.num_frames,
                              compute_dtype=cdt,
                              name=f"layer{i + 1}_{j}")(
                                  h, deterministic=deterministic)
            stage_outs.append(h)
            planes *= 2
        if len(self.out_indices) > 1:
            return tuple(stage_outs[i].astype(jnp.float32)
                         for i in self.out_indices)
        if self.spatial_pool:
            return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        return h


@BACKBONES.register_module()
class ResNetTSM(ResNet):
    """ResNet with the Temporal Shift Module (``num_frames`` required)."""

    def __call__(self, x, deterministic: bool = True):
        if self.num_frames is None:
            raise ValueError("ResNetTSM requires num_frames")
        return super().__call__(x, deterministic=deterministic)
