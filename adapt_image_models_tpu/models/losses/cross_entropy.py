"""Classification losses (reference ``mmaction/models/losses/cross_entropy_loss.py``).

Pure functions plus thin registered wrappers. The reference dispatches on
label shape: hard int labels -> F.cross_entropy, soft (one-hot/blended)
labels -> ``-(soft_label * log_softmax(logits)).sum(1).mean()`` — same here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.builder import LOSSES


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  class_weight: Optional[jax.Array] = None) -> jax.Array:
    """Hard-label CE. logits (B, C) fp32, labels (B,) int."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weight is not None:
        w = class_weight[labels]
        return jnp.sum(nll * w) / jnp.sum(w)
    return jnp.mean(nll)


def soft_cross_entropy(logits: jax.Array, soft_labels: jax.Array,
                       class_weight: Optional[jax.Array] = None) -> jax.Array:
    """Soft-label CE for mixup/cutmix/label-smoothing targets (B, C)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -(soft_labels * logp)
    if class_weight is not None:
        per = per * class_weight[None, :]
    return jnp.mean(jnp.sum(per, axis=-1))


def binary_cross_entropy_with_logits(logits: jax.Array, labels: jax.Array,
                                     weight: Optional[jax.Array] = None) -> jax.Array:
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        per = per * weight
    return jnp.mean(per)


@LOSSES.register_module()
class CrossEntropyLoss:
    """Dispatches hard vs soft labels like the reference (`:9-60`)."""

    def __init__(self, loss_weight: float = 1.0, class_weight=None):
        self.loss_weight = loss_weight
        self.class_weight = None if class_weight is None else jnp.asarray(class_weight)

    def __call__(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        if labels.ndim == logits.ndim:  # soft labels
            loss = soft_cross_entropy(logits, labels, self.class_weight)
        else:
            loss = cross_entropy(logits, labels, self.class_weight)
        return self.loss_weight * loss


@LOSSES.register_module()
class BCELossWithLogits:
    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        return self.loss_weight * binary_cross_entropy_with_logits(logits, labels)


@LOSSES.register_module()
class NLLLoss:
    """NLL over already-log-probability inputs (reference ``nll_loss.py``)."""

    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, logp: jax.Array, labels: jax.Array) -> jax.Array:
        nll = -jnp.take_along_axis(logp.astype(jnp.float32), labels[:, None], axis=-1)[:, 0]
        return self.loss_weight * jnp.mean(nll)
