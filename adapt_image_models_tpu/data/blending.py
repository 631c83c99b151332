"""Batch blending augmentations (reference
``mmaction/datasets/blending_utils.py:16-152``): Mixup, CutMix,
LabelSmoothing — as pure jax functions applied inside the jitted train step
(on device, after the uint8->float prepare), instead of the reference's
host-side torch implementation.

All return ``(blended_imgs, soft_labels)`` with labels one-hot (B, C).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot(labels: jax.Array, num_classes: int,
            smoothing: float = 0.0) -> jax.Array:
    oh = jax.nn.one_hot(labels, num_classes)
    if smoothing > 0:
        oh = oh * (1.0 - smoothing) + smoothing / num_classes
    return oh


def label_smoothing(rng, imgs: jax.Array, labels: jax.Array, num_classes: int,
                    smoothing: float = 0.1) -> Tuple[jax.Array, jax.Array]:
    """LabelSmoothing blending (reference `:150`; used by the SSv2 recipe)."""
    del rng
    return imgs, one_hot(labels, num_classes, smoothing)


def mixup(rng, imgs: jax.Array, labels: jax.Array, num_classes: int,
          alpha: float = 0.2, smoothing: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """MixupBlending (reference `:65-93`): one lambda per batch, partner is
    the batch rolled by one (torch.randperm in the reference; roll keeps the
    permutation static for XLA while preserving the pairing distribution)."""
    r_lam, _ = jax.random.split(rng)
    lam = jax.random.beta(r_lam, alpha, alpha)
    oh = one_hot(labels, num_classes, smoothing)
    imgs2 = jnp.roll(imgs, 1, axis=0)
    oh2 = jnp.roll(oh, 1, axis=0)
    mixed = lam * imgs.astype(jnp.float32) + (1 - lam) * imgs2.astype(jnp.float32)
    return mixed.astype(imgs.dtype), lam * oh + (1 - lam) * oh2


def cutmix(rng, imgs: jax.Array, labels: jax.Array, num_classes: int,
           alpha: float = 0.2, smoothing: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """CutmixBlending (reference `:96-148`). imgs: (B, ..., H, W) with
    spatial dims last two (NCTHW layout)."""
    r_lam, r_box = jax.random.split(rng)
    lam = jax.random.beta(r_lam, alpha, alpha)
    h, w = imgs.shape[-2], imgs.shape[-1]

    cut_ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * cut_ratio).astype(jnp.int32)
    cut_w = (w * cut_ratio).astype(jnp.int32)
    rcy, rcx = jax.random.randint(r_box, (2,), 0, jnp.array([h, w]))
    y1 = jnp.clip(rcy - cut_h // 2, 0, h)
    y2 = jnp.clip(rcy + cut_h // 2, 0, h)
    x1 = jnp.clip(rcx - cut_w // 2, 0, w)
    x2 = jnp.clip(rcx + cut_w // 2, 0, w)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    box = ((yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2))
    box = box.reshape((1,) * (imgs.ndim - 2) + (h, w))

    imgs2 = jnp.roll(imgs, 1, axis=0)
    out = jnp.where(box, imgs2, imgs)
    lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)
    oh = one_hot(labels, num_classes, smoothing)
    oh2 = jnp.roll(oh, 1, axis=0)
    return out, lam_adj * oh + (1 - lam_adj) * oh2


def build_blending(cfg):
    """mmaction-style blending config -> (rng, imgs, labels) -> (imgs, soft)."""
    if cfg is None:
        return None
    cfg = dict(cfg)
    t = cfg.pop("type")
    num_classes = cfg.pop("num_classes")
    if t in ("LabelSmoothing", "LabelSmoothBlending"):
        s = cfg.pop("smoothing", 0.1)
        return lambda rng, x, y: label_smoothing(rng, x, y, num_classes, s)
    if t in ("MixupBlending", "Mixup"):
        a = cfg.pop("alpha", 0.2)
        s = cfg.pop("smoothing", 0.0)
        return lambda rng, x, y: mixup(rng, x, y, num_classes, a, s)
    if t in ("CutmixBlending", "Cutmix"):
        a = cfg.pop("alpha", 0.2)
        s = cfg.pop("smoothing", 0.0)
        return lambda rng, x, y: cutmix(rng, x, y, num_classes, a, s)
    raise KeyError(f"unsupported blending {t}")
