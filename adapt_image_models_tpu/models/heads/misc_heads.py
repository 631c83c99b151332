"""Additional classification heads (reference ``mmaction/models/heads/``):
TSMHead (111 LoC), SlowFastHead, X3DHead, TimeSformerHead, TPNHead.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS


@HEADS.register_module()
class TSMHead(nn.Module):
    """TSM: avg consensus AFTER the classifier (is_shift=True semantics)."""

    num_classes: int
    in_channels: int
    num_segments: int = 8
    dropout_ratio: float = 0.8
    init_std: float = 0.001
    # reference TSMHead(temporal_pool=True): consensus runs over the
    # backbone's halved segment count — the recognizer already infers the
    # pooled length from the feature rows, so this is config-surface parity
    temporal_pool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: (B, S, D) segment features
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        logits = nn.Dense(self.num_classes,
                          kernel_init=nn.initializers.normal(self.init_std),
                          dtype=jnp.float32, name="fc_cls")(x.astype(jnp.float32))
        return jnp.mean(logits, axis=1)  # consensus over segments


@HEADS.register_module()
class SlowFastHead(nn.Module):
    """Concatenated slow+fast pooled features -> fc (reference
    ``slowfast_head.py``). Input: tuple/list of feature maps or a single
    pre-concatenated (B, ..., C)."""

    num_classes: int
    in_channels: int
    dropout_ratio: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jax.Array:
        if isinstance(x, (tuple, list)):
            x = jnp.concatenate(
                [jnp.mean(f, axis=tuple(range(1, f.ndim - 1))) for f in x],
                axis=-1)
        elif x.ndim > 2:
            x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=jnp.float32, name="fc_cls")(x.astype(jnp.float32))


@HEADS.register_module()
class X3DHead(nn.Module):
    """pool -> fc1 (expand) -> relu -> fc2 (reference ``x3d_head.py``)."""

    num_classes: int
    in_channels: int
    mid_channels: int = 2048
    dropout_ratio: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if x.ndim > 2:
            x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        x = nn.Dense(self.mid_channels,
                     kernel_init=nn.initializers.normal(self.init_std),
                     dtype=jnp.float32, name="fc1")(x.astype(jnp.float32))
        x = nn.relu(x)
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=jnp.float32, name="fc_cls")(x)


@HEADS.register_module()
class TimeSformerHead(nn.Module):
    """Single cls-token feature -> fc (reference ``timesformer_head.py``)."""

    num_classes: int
    in_channels: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if x.ndim == 3:
            x = x[:, 0]
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=jnp.float32, name="fc_cls")(x.astype(jnp.float32))


@HEADS.register_module()
class TPNHead(nn.Module):
    """Head for TPN-fused pyramid features (reference ``tpn_head.py``:
    a TSNHead applied after 3D spatial+temporal avg pooling, with avg
    consensus over the pooled clip axis).

    Accepts the neck's fused ``(B, T', H', W', C)`` map — spatial_type
    'avg'/'max' pooling over (T', H', W'), dropout, fp32 fc.
    """

    num_classes: int
    in_channels: int
    spatial_type: str = "avg"
    consensus: Optional[Dict[str, Any]] = None  # avg consensus (implicit)
    dropout_ratio: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        reduce_axes = tuple(range(1, x.ndim - 1))
        if self.spatial_type == "max":
            x = jnp.max(x, axis=reduce_axes)
        else:
            x = jnp.mean(x, axis=reduce_axes)
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=jnp.float32, name="fc_cls")(x.astype(jnp.float32))
