"""TSN head: segment-consensus average + linear classifier
(reference ``mmaction/models/heads/tsn_head.py``).

Takes 2D-recognizer features ``(B*num_segs, D)`` (or ``(B, S, D)``) and
averages segment scores before/after the classifier according to the
standard TSN avg consensus (the reference pools before the fc).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS


@HEADS.register_module()
class TSNHead(nn.Module):
    num_classes: int
    in_channels: int
    dropout_ratio: float = 0.4
    init_std: float = 0.01
    # reference head-config parity: the loss itself runs in the train step,
    # which reads these fields (core/train_state.make_train_step)
    multi_class: bool = False
    loss_cls: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: (B, S, D) segment features -> avg consensus -> (B, D)
        if x.ndim == 3:
            x = jnp.mean(x, axis=1)
        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio)(x, deterministic=deterministic)
        x = x.astype(jnp.float32)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(stddev=self.init_std),
                        bias_init=nn.initializers.zeros,
                        dtype=jnp.float32, name="fc_cls")(x)
