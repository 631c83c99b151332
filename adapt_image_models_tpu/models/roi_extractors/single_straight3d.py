"""3D RoI feature extraction (reference
``mmaction/models/roi_extractors/single_straight3d.py:27-128``).

The reference wraps mmcv's CUDA RoIAlign and loops python-side over the
temporal dim; here the temporal pool collapses T first (AVA configs use
``with_temporal_pool=True``) and a single vectorized XLA RoIAlign handles
all (batch, roi) pairs with static shapes — no CUDA op, no per-frame loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.ops.roi_align import roi_align


class SingleRoIExtractor3D(nn.Module):
    """Extract (B, R, O, O, C) RoI features from a (B, T', H', W', C)
    feature map and (B, R, 4) boxes in input-image pixel coordinates."""

    roi_layer_type: str = "RoIAlign"
    featmap_stride: int = 16
    output_size: int = 8
    sampling_ratio: int = 0
    pool_mode: str = "avg"
    aligned: bool = True
    with_temporal_pool: bool = True
    temporal_pool_mode: str = "avg"
    with_global: bool = False

    @nn.compact
    def __call__(self, feat: jax.Array, rois: jax.Array) -> jax.Array:
        if self.roi_layer_type != "RoIAlign":
            raise NotImplementedError("only RoIAlign is supported on TPU")
        # feat: (B, T', H', W', C)
        if self.with_temporal_pool:
            if self.temporal_pool_mode == "avg":
                feat2d = feat.mean(axis=1)
            elif self.temporal_pool_mode == "max":
                feat2d = feat.max(axis=1)
            else:
                raise NotImplementedError(self.temporal_pool_mode)
        else:
            raise NotImplementedError(
                "with_temporal_pool=False is not supported; the AVA configs "
                "always pool the temporal dim "
                "(reference single_straight3d.py:103-108)")

        out = roi_align(feat2d, rois, self.output_size,
                        spatial_scale=1.0 / self.featmap_stride,
                        sampling_ratio=self.sampling_ratio,
                        aligned=self.aligned)  # (B, R, O, O, C)
        if self.with_global:
            g = jax.image.resize(
                feat2d, (feat2d.shape[0], self.output_size, self.output_size,
                         feat2d.shape[-1]), method="linear")
            g = jnp.broadcast_to(g[:, None], out.shape)
            out = jnp.concatenate([out, g], axis=-1)
        return out
