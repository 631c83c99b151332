"""Audio recognizer (reference ``mmaction/models/recognizers/audio_recognizer.py``):
spectrogram clips -> audio backbone -> AudioTSNHead."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import (
    RECOGNIZERS, HEADS, build_backbone, build_head,
)
from adapt_image_models_tpu.models.recognizers.recognizer3d import average_clip


@HEADS.register_module()
class AudioTSNHead(nn.Module):
    """(reference ``mmaction/models/heads/audio_tsn_head.py``)."""

    num_classes: int
    in_channels: int
    dropout_ratio: float = 0.4
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if x.ndim > 2:
            x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=jnp.float32, name="fc_cls")(x.astype(jnp.float32))


@RECOGNIZERS.register_module()
class AudioRecognizer(nn.Module):
    """audios: (B, S, 1, frames, n_mels) spectrogram segments -> logits."""

    backbone: Dict[str, Any]
    cls_head: Dict[str, Any]
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        self.backbone_module = build_backbone(dict(self.backbone))
        self.head_module = build_head(dict(self.cls_head))

    def __call__(self, audios: jax.Array, deterministic: bool = True) -> jax.Array:
        b, s = audios.shape[:2]
        x = audios.reshape((b * s,) + audios.shape[2:])
        feat = self.backbone_module(x, deterministic=deterministic)
        feat = feat.reshape(b, s, -1)
        return self.head_module(feat, deterministic=deterministic)

    def forward_test(self, audios: jax.Array) -> jax.Array:
        logits = self(audios, deterministic=True)
        avg = (self.test_cfg or {}).get("average_clips", "prob")
        return average_clip(logits, 1, avg)
