"""Jittable bilinear RoIAlign (XLA gather formulation).

TPU-native replacement for the mmcv CUDA RoIAlign op the reference's
detection path depends on
(``/root/reference/mmaction/models/roi_extractors/single_straight3d.py:8``).
Matches mmcv semantics with ``aligned=True`` (continuous coordinates, pixel
centers at half-integers) and average pooling over a per-bin sample grid.

One deliberate deviation for XLA: mmcv's ``sampling_ratio=0`` picks the
per-bin sample count adaptively from the RoI size (data-dependent shapes);
here the grid is static — ``sampling_ratio=0`` maps to 2 samples per bin
axis, which is the adaptive choice for typical AVA person boxes on stride-16
feature maps. Boxes are processed in fixed-shape (B, R, 4) batches; padded
rows simply produce garbage features that downstream zero-weight masking
ignores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(feat: jax.Array, rois: jax.Array, output_size: int,
              spatial_scale: float = 1.0, sampling_ratio: int = 0,
              aligned: bool = True) -> jax.Array:
    """feat: (B, H, W, C); rois: (B, R, 4) x1,y1,x2,y2 in IMAGE pixels
    (scaled by ``spatial_scale`` onto the feature grid) -> (B, R, O, O, C).
    """
    s = sampling_ratio if sampling_ratio > 0 else 2
    o = output_size
    offset = 0.5 if aligned else 0.0

    def one_image(f, boxes):
        h, w, c = f.shape
        boxes = boxes * spatial_scale
        x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
        if aligned:
            x1, y1, x2, y2 = x1 - offset, y1 - offset, x2 - offset, y2 - offset
            roi_w = jnp.maximum(x2 - x1, 1e-6)
            roi_h = jnp.maximum(y2 - y1, 1e-6)
        else:
            roi_w = jnp.maximum(x2 - x1, 1.0)
            roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / o
        bin_h = roi_h / o

        # sample coordinates: (R, o*s) per axis
        grid = (jnp.arange(o * s) // s).astype(jnp.float32)
        sub = (jnp.arange(o * s) % s).astype(jnp.float32)
        frac = grid + (sub + 0.5) / s
        xs = x1[:, None] + frac[None, :] * bin_w[:, None]  # (R, o*s)
        ys = y1[:, None] + frac[None, :] * bin_h[:, None]

        def bilinear(coords_y, coords_x):
            # coords: (R, P) each. mmcv clamps coords in (-1, 0) to the
            # edge BEFORE computing weights (value = f[0] there), so border
            # bins of edge-touching boxes match bilinear_interpolate exactly
            valid = ((coords_y > -1.0) & (coords_y < h) &
                     (coords_x > -1.0) & (coords_x < w))
            coords_y = jnp.clip(coords_y, 0.0, None)
            coords_x = jnp.clip(coords_x, 0.0, None)
            y0 = jnp.floor(coords_y)
            x0 = jnp.floor(coords_x)
            wy1 = coords_y - y0
            wx1 = coords_x - x0
            y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
            y1i = jnp.clip(y0i + 1, 0, h - 1)
            x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
            x1i = jnp.clip(x0i + 1, 0, w - 1)
            # out-of-range samples contribute zero (mmcv: empty outside)
            v00 = f[y0i, x0i]
            v01 = f[y0i, x1i]
            v10 = f[y1i, x0i]
            v11 = f[y1i, x1i]
            wy0 = 1.0 - wy1
            wx0 = 1.0 - wx1
            out = (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
                   + v10 * (wy1 * wx0)[..., None]
                   + v11 * (wy1 * wx1)[..., None])
            return jnp.where(valid[..., None], out, 0.0)

        # full (R, o*s, o*s) sample lattice
        yy = jnp.repeat(ys[:, :, None], o * s, axis=2)  # (R, os, os)
        xx = jnp.repeat(xs[:, None, :], o * s, axis=1)
        r = xs.shape[0]
        vals = bilinear(yy.reshape(r, -1), xx.reshape(r, -1))
        vals = vals.reshape(r, o, s, o, s, c)
        return vals.mean(axis=(2, 4))  # (R, o, o, C)

    return jax.vmap(one_image)(feat.astype(jnp.float32),
                               rois.astype(jnp.float32))
