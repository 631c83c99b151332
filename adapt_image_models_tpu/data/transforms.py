"""Device-side (jitted XLA) preprocessing.

The tail of the reference's CPU transform chain — Normalize
(``augmentations.py:1393``; the fork moves it on-accelerator via the
``GPUNormalize`` hook, ``mmaction/utils/module_hooks.py:35``), FormatShape
NCTHW (``formating.py:252-277``) and the uint8->float cast — runs here as
one jitted graph that XLA fuses straight into the first conv of the model.
Host workers only ship fixed-shape uint8 clips.

Also provides pure-jax resize/crop/flip for fully-on-device pipelines over
fixed-size sources (synthetic benches, pre-resized datasets).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# CLIP normalization constants (0-255 scale), used by all AIM configs
# (reference configs/recognition/vit/vitclip_base_k400.py img_norm_cfg).
CLIP_MEAN = (122.769, 116.74, 104.04)
CLIP_STD = (68.493, 66.63, 70.321)
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def normalize(imgs: jax.Array, mean: Sequence[float] = CLIP_MEAN,
              std: Sequence[float] = CLIP_STD,
              dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """(..., C) uint8/float -> normalized float."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = imgs.astype(jnp.float32)
    return ((x - mean) / std).astype(dtype)


def format_ncthw(clip: jax.Array) -> jax.Array:
    """(..., T, H, W, C) -> (..., C, T, H, W)  (FormatShape('NCTHW'))."""
    perm = tuple(range(clip.ndim - 4)) + (
        clip.ndim - 1, clip.ndim - 4, clip.ndim - 3, clip.ndim - 2)
    return clip.transpose(perm)


@functools.partial(jax.jit, static_argnames=("dtype",))
def prepare_batch(clips_uint8: jax.Array,
                  mean: jax.Array, std: jax.Array,
                  dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """(B[, V], T, H, W, C) uint8 -> (B[, V], C, T, H, W) normalized."""
    x = normalize(clips_uint8, mean, std, dtype)
    return format_ncthw(x)


def layout_from_pipeline(pipeline) -> str:
    """The recipe's ``FormatShape`` input_format (reference
    ``formating.py:252``): NCTHW (3D models), NCHW (2D segment models),
    NCHW_Flow (2D flow), NPTCHW (SSN). Defaults to NCTHW."""
    for item in pipeline:
        if item.get("type") == "FormatShape":
            return item.get("input_format", "NCTHW")
    return "NCTHW"


def init_sample_shape(pipeline, proc) -> Tuple[int, ...]:
    """Shape of a model-init dummy consistent with what the prepared
    batches of this recipe will look like: (1, 3, T, H, W) for the 3D
    NCTHW contract, (1, S, 3, H, W) segments for 2D NCHW recipes,
    (1, V, 2L, H, W) for NCHW_Flow (L flow frames stack into channels)."""
    h, w = proc.output_size()
    t = proc.sampler.clip_len
    v = getattr(proc.sampler, "num_clips", 1) or 1
    layout = layout_from_pipeline(pipeline)
    if layout == "NCHW":
        return (1, v * t, 3, h, w)
    if layout == "NCHW_Flow":
        return (1, v, 2 * t, h, w)
    return (1, 3, t, h, w)


def make_prepare_fn(mean=CLIP_MEAN, std=CLIP_STD, dtype=jnp.float32,
                    layout: str = "NCTHW"):
    """Device-side batch prep: normalize + format.

    ``layout`` mirrors the recipe's FormatShape:

    * ``NCTHW`` — (B[, V], T, H, W, C) -> (B[, V], C, T, H, W); the 3D
      recognizer contract (views fold into batch downstream).
    * ``NCHW`` — -> (B, V*T, C, H, W); the 2D segment contract
      (``Recognizer2D``): crops x clips x frames all become consensus
      segments, exactly the reference's test-time fold
      (``recognizer2d.py`` num_segs = total rows / batch).
    * ``NCHW_Flow`` — -> (B, V, T*C, H, W); per clip, the L flow frames'
      (dx, dy) planes stack frame-major into one 2L-channel image
      (reference ``formating.py:268-278``).
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    if layout not in ("NCTHW", "NCHW", "NCHW_Flow"):
        raise ValueError(f"unsupported prepare layout {layout!r}")

    def prepare(clips_uint8):
        x = prepare_batch(clips_uint8, mean, std, dtype)
        if layout == "NCTHW":
            return x
        if x.ndim == 5:  # no view axis: treat as a single view
            x = x[:, None]
        b, v, c, t, h, w = x.shape
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, V, T, C, H, W)
        if layout == "NCHW":
            return x.reshape(b, v * t, c, h, w)
        return x.reshape(b, v, t * c, h, w)  # NCHW_Flow

    return prepare


# ---------------------------------------------------------------------------
# pure-jax geometric ops (fixed static shapes)


def resize_bilinear(clip: jax.Array, size_hw: Tuple[int, int]) -> jax.Array:
    """(..., H, W, C) -> (..., h, w, C) bilinear resize on device."""
    out_shape = clip.shape[:-3] + (size_hw[0], size_hw[1], clip.shape[-1])
    return jax.image.resize(clip.astype(jnp.float32), out_shape, "bilinear")


def center_crop(clip: jax.Array, crop_hw: Tuple[int, int]) -> jax.Array:
    h, w = clip.shape[-3], clip.shape[-2]
    ch, cw = crop_hw
    top = (h - ch) // 2
    left = (w - cw) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(clip, top, top + ch, axis=clip.ndim - 3),
        left, left + cw, axis=clip.ndim - 2)


def three_crop(clip: jax.Array, crop_hw: Tuple[int, int]) -> jax.Array:
    """(..., H, W, C) -> stacked (3, ..., ch, cw, C), left/right/middle order."""
    h, w = clip.shape[-3], clip.shape[-2]
    ch, cw = crop_hw
    ax_h, ax_w = clip.ndim - 3, clip.ndim - 2

    def crop_at(left, top):
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(clip, top, top + ch, axis=ax_h),
            left, left + cw, axis=ax_w)

    if ch == h:
        step = (w - cw) // 2
        crops = [crop_at(0, 0), crop_at(2 * step, 0), crop_at(step, 0)]
    elif cw == w:
        step = (h - ch) // 2
        crops = [crop_at(0, 0), crop_at(0, 2 * step), crop_at(0, step)]
    else:
        raise ValueError("three_crop needs crop matching one side")
    return jnp.stack(crops, axis=0)


def horizontal_flip(clip: jax.Array) -> jax.Array:
    return jnp.flip(clip, axis=clip.ndim - 2)


def random_flip(rng: jax.Array, clip: jax.Array, prob: float = 0.5) -> jax.Array:
    """Per-sample random horizontal flip on the leading batch axis."""
    b = clip.shape[0]
    do = jax.random.bernoulli(rng, prob, (b,) + (1,) * (clip.ndim - 1))
    return jnp.where(do, horizontal_flip(clip), clip)


def format_nchw_flow(clip: jax.Array, clip_len: int) -> jax.Array:
    """(..., N_clips * L, H, W, C) stacked flow frames ->
    (..., N_clips, L*C, H, W): per clip, the L frames' (dx, dy) channels
    stack into one 2L-channel image (reference ``formating.py:268-278``
    'NCHW_Flow')."""
    *lead, m, h, w, c = clip.shape
    n_clips = m // clip_len
    x = clip.reshape(*lead, n_clips, clip_len, h, w, c)
    nd = x.ndim
    # (..., n_clips, L, H, W, C) -> (..., n_clips, L, C, H, W): frame-major
    # channel stacking [dx0, dy0, dx1, dy1, ...], matching the reference
    x = x.transpose(*range(nd - 4), nd - 4, nd - 1, nd - 3, nd - 2)
    return x.reshape(*lead, n_clips, clip_len * c, h, w)


def format_nptchw(clip: jax.Array, num_proposals: int) -> jax.Array:
    """(P * M, H, W, C) proposal segment frames -> (P, M, C, H, W)
    (reference ``formating.py:313-322`` 'NPTCHW', the SSN layout)."""
    pm, h, w, c = clip.shape
    m = pm // num_proposals
    x = clip.reshape(num_proposals, m, h, w, c)
    return x.transpose(0, 1, 4, 2, 3)
