"""TPN — Temporal Pyramid Network neck
(reference ``mmaction/models/necks/tpn.py``, 448 LoC).

Takes a tuple of backbone stage feature maps (channels-last
``(B, T, H, W, C_i)``), aligns them (spatial modulation), builds temporal
pyramid levels (temporal modulation = conv + temporal max-pool at per-level
scales), runs top-down and bottom-up fusion flows, and fuses both pyramids.
An auxiliary head on the second-to-last stage provides the aux CE loss
(computed by the caller from the returned logits).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import NECKS

Dtype = jnp.dtype


def _conv_bn_relu(x, ch, kernel, strides, name, deterministic, dtype,
                  groups: int = 1):
    x = nn.Conv(ch, kernel, strides, use_bias=False,
                feature_group_count=groups, dtype=dtype,
                name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                     name=f"{name}_bn")(x)
    return nn.relu(x)


class LevelFusion(nn.Module):
    """Per-level 1x1x1 conv reductions -> concat -> fuse conv
    (reference ``:84-143``)."""

    mid_channels: int
    out_channels: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        outs = []
        for i, x in enumerate(xs):
            outs.append(_conv_bn_relu(x, self.mid_channels, (1, 1, 1),
                                      (1, 1, 1), f"level{i}", deterministic,
                                      self.compute_dtype))
        x = jnp.concatenate(outs, axis=-1)
        return _conv_bn_relu(x, self.out_channels, (1, 1, 1), (1, 1, 1),
                             "fusion", deterministic, self.compute_dtype)


@NECKS.register_module()
class TPN(nn.Module):
    in_channels: Tuple[int, ...] = (1024, 2048)
    out_channels: int = 1024
    downsample_scales: Tuple[int, ...] = (8, 8)
    mid_channels: int = 1024
    fusion_channels: int = 2048
    aux_head_classes: Optional[int] = None
    aux_loss_weight: float = 0.5
    flow_type: str = "cascade"
    compute_dtype: Dtype = jnp.float32
    # reference-shaped nested sub-configs (``_base_/models/tpn_slowonly_r50.py``)
    # are accepted and override the flattened fields above; upsample/downsample
    # cfgs are validated for presence only (this implementation derives the
    # inter-level scale factors from the actual level shapes)
    spatial_modulation_cfg: Optional[Dict[str, Any]] = None
    temporal_modulation_cfg: Optional[Dict[str, Any]] = None
    upsample_cfg: Optional[Dict[str, Any]] = None
    downsample_cfg: Optional[Dict[str, Any]] = None
    level_fusion_cfg: Optional[Dict[str, Any]] = None
    aux_head_cfg: Optional[Dict[str, Any]] = None

    def _resolved(self):
        """Effective (downsample_scales, mid, fusion, aux_classes, aux_w)."""
        scales = tuple(self.temporal_modulation_cfg["downsample_scales"]) \
            if self.temporal_modulation_cfg else tuple(self.downsample_scales)
        mid = self.mid_channels
        fusion = self.fusion_channels
        if self.level_fusion_cfg:
            lf_mid = self.level_fusion_cfg.get("mid_channels")
            if lf_mid:
                mid = lf_mid[0] if isinstance(lf_mid, (tuple, list)) else lf_mid
            fusion = self.level_fusion_cfg.get("out_channels", fusion)
        aux_classes = self.aux_head_cfg["out_channels"] \
            if self.aux_head_cfg else self.aux_head_classes
        aux_w = self.aux_head_cfg.get("loss_weight", self.aux_loss_weight) \
            if self.aux_head_cfg else self.aux_loss_weight
        return scales, mid, fusion, aux_classes, aux_w

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        """xs: tuple of (B, T, H_i, W_i, C_i), coarsest last.
        Returns (fused (B, T', H', W', 2048), aux_logits or None)."""
        if self.flow_type not in ("cascade", "parallel"):
            raise ValueError(f"flow_type must be cascade/parallel, got {self.flow_type}")
        cdt = self.compute_dtype
        n = len(xs)
        if n != len(self.in_channels):
            raise ValueError(f"got {n} stages for {len(self.in_channels)} in_channels")
        (downsample_scales, mid_channels, fusion_channels,
         aux_head_classes, _) = self._resolved()

        # aux head on the second-to-last stage (reference :197-256)
        aux_logits = None
        if aux_head_classes:
            a = _conv_bn_relu(xs[-2], self.in_channels[-1], (1, 3, 3),
                              (1, 2, 2), "aux", deterministic, cdt)
            a = jnp.mean(a, axis=(1, 2, 3))
            a = nn.Dropout(0.5)(a, deterministic=deterministic)
            aux_logits = nn.Dense(aux_head_classes, dtype=jnp.float32,
                                  name="aux_fc")(a.astype(jnp.float32))

        # spatial modulation: downsample earlier stages to the last one's
        # spatial size and channel count (reference :145-195)
        target_c = self.in_channels[-1]
        modulated = []
        for i, x in enumerate(xs):
            factor = 2 ** (n - 1 - i)
            h = x
            for k in range(n - 1 - i):
                h = _conv_bn_relu(h, target_c // (2 ** (n - 2 - i - k)),
                                  (1, 3, 3), (1, 2, 2), f"spatial{i}_{k}",
                                  deterministic, cdt)
            modulated.append(h)

        # temporal modulation: conv + temporal max-pool per level scale
        levels = []
        for i, x in enumerate(modulated):
            h = nn.Conv(self.out_channels, (3, 1, 1), use_bias=False,
                        feature_group_count=32 if target_c % 32 == 0 else 1,
                        dtype=cdt, name=f"temporal{i}_conv")(x)
            scale = downsample_scales[i]
            if scale > 1:
                t = h.shape[1]
                pad = (-t) % scale
                if pad:
                    h = jnp.pad(h, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)),
                                constant_values=-jnp.inf)
                h = h.reshape(h.shape[0], h.shape[1] // scale, scale,
                              *h.shape[2:]).max(axis=2)
            levels.append(h)

        # top-down flow (nearest temporal upsample + add)
        outs = list(levels)
        for i in range(n - 1, 0, -1):
            up = outs[i]
            ratio = outs[i - 1].shape[1] // up.shape[1]
            if ratio > 1:
                up = jnp.repeat(up, ratio, axis=1)
            outs[i - 1] = outs[i - 1] + up[:, :outs[i - 1].shape[1]]
        top_down = LevelFusion(mid_channels, fusion_channels // 2,
                               compute_dtype=cdt, name="level_fusion_1")(
            [jnp.max(o.reshape(o.shape[0], levels[-1].shape[1], -1,
                               *o.shape[2:]), axis=2) if
             o.shape[1] != levels[-1].shape[1] else o for o in outs],
            deterministic=deterministic)

        # bottom-up flow (temporal max-pool downsample + add)
        outs = list(levels) if self.flow_type == "parallel" else outs
        for i in range(n - 1):
            down = outs[i]
            ratio = down.shape[1] // outs[i + 1].shape[1]
            if ratio > 1:
                down = down.reshape(down.shape[0],
                                    down.shape[1] // ratio, ratio,
                                    *down.shape[2:]).max(axis=2)
            outs[i + 1] = outs[i + 1] + down[:, :outs[i + 1].shape[1]]
        bottom_up = LevelFusion(mid_channels, fusion_channels // 2,
                                compute_dtype=cdt, name="level_fusion_2")(
            [jnp.max(o.reshape(o.shape[0], levels[-1].shape[1], -1,
                               *o.shape[2:]), axis=2) if
             o.shape[1] != levels[-1].shape[1] else o for o in outs],
            deterministic=deterministic)

        fused = jnp.concatenate([top_down, bottom_up], axis=-1)
        fused = _conv_bn_relu(fused, fusion_channels, (1, 1, 1),
                              (1, 1, 1), "pyramid_fusion", deterministic, cdt)
        return fused, aux_logits
