"""TRNHead — Temporal Relation Network head
(reference ``mmaction/models/heads/trn_head.py``, 210 LoC).

Multi-scale relations: for each scale k in [2..num_segments], a fixed set of
k-segment subsets (the reference samples random subsets once at init; here
the first ``num_relations`` evenly-spread combinations — deterministic and
jit-static) are each concatenated and scored by a per-scale MLP; scale
scores are summed.
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS


def _relation_subsets(num_segments: int, scale: int,
                      max_relations: int = 3) -> Tuple[Tuple[int, ...], ...]:
    combos = list(itertools.combinations(range(num_segments), scale))
    if len(combos) <= max_relations:
        return tuple(combos)
    idx = [int(round(i * (len(combos) - 1) / (max_relations - 1)))
           for i in range(max_relations)]
    return tuple(combos[i] for i in idx)


@HEADS.register_module()
class TRNHead(nn.Module):
    num_classes: int
    in_channels: int
    num_segments: int = 8
    hidden_dim: int = 256
    num_relations: int = 3
    relation_type: str = "TRNMultiScale"  # or 'TRN' (full-scale only)
    dropout_ratio: float = 0.8
    init_std: float = 0.001

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: (B, S, D)
        b, s, d = x.shape
        if s != self.num_segments:
            raise ValueError(f"got {s} segments, head built for {self.num_segments}")
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        x = x.astype(jnp.float32)

        scales = ([self.num_segments] if self.relation_type == "TRN"
                  else list(range(self.num_segments, 1, -1)))
        total = jnp.zeros((b, self.num_classes), jnp.float32)
        for scale in scales:
            subsets = _relation_subsets(self.num_segments, scale,
                                        self.num_relations)
            # one MLP per scale, SHARED across its subsets (reference
            # fc_fusion_scales)
            fc1 = nn.Dense(self.hidden_dim, dtype=jnp.float32,
                           name=f"rel{scale}_fc1")
            fc2 = nn.Dense(self.num_classes, dtype=jnp.float32,
                           kernel_init=nn.initializers.normal(self.init_std),
                           name=f"rel{scale}_fc2")
            scale_score = jnp.zeros((b, self.num_classes), jnp.float32)
            for subset in subsets:
                feat = x[:, jnp.asarray(subset)].reshape(b, scale * d)
                scale_score = scale_score + fc2(nn.relu(fc1(feat)))
            total = total + scale_score / len(subsets)
        return total
