"""Optimizer construction with mmcv ``paramwise_cfg`` semantics.

Reference (``vitclip_base_k400.py:96-105``, ``vitclip_large_k400.py:105``):
AdamW with ``custom_keys`` that zero weight decay on embeddings/LayerNorms
and (ViT-L) apply ``lr_mult=0.1`` to the backbone. mmcv's
DefaultOptimizerConstructor matches *name substrings*; same here against
'/'-joined flax param paths. Gradient accumulation (the reference's
``DistOptimizerHook.update_interval``) is ``optax.MultiSteps``.

The optimizer only ever sees the TRAINABLE sub-tree (adapters + temporal
embedding + ln_post + head) — the frozen CLIP weights never enter optimizer
state, which also keeps Adam moments 8x smaller than the reference's.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax
import optax
from flax import traverse_util

# biases and 1-d norm scales conventionally skip decay; the reference
# reaches the same effect through custom_keys on ln_*/embeddings.
DEFAULT_NO_DECAY_KEYS = ("class_embedding", "positional_embedding",
                         "temporal_embedding", "ln_1", "ln_2", "ln_pre",
                         "ln_post", "bias")


def _path_str(path) -> str:
    return "/".join(str(p) for p in path)


def _match_custom_keys(path_str: str, custom_keys: Dict[str, Dict[str, float]],
                       field: str, default: float) -> float:
    """Longest-substring-match wins (mmcv sorts by key length)."""
    best = default
    best_len = -1
    for key, mults in custom_keys.items():
        if key in path_str and len(key) > best_len:
            if field in mults:
                best = mults[field]
                best_len = len(key)
    return best


def build_optimizer(optimizer_cfg: Dict[str, Any], params,
                    schedule: Union[float, Callable],
                    grad_clip: Optional[float] = None,
                    update_interval: int = 1) -> optax.GradientTransformation:
    """Build from an mmcv-style optimizer config dict.

    ``params``: the trainable sub-tree (for building masks/mult trees).
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "AdamW")
    lr = cfg.pop("lr")
    paramwise = cfg.pop("paramwise_cfg", {}) or {}
    custom_keys = paramwise.get("custom_keys", {})
    cfg.pop("constructor", None)

    flat = traverse_util.flatten_dict(
        params.unfreeze() if hasattr(params, "unfreeze") else params)
    paths = {k: _path_str(k) for k in flat}

    # weight-decay mask: decay_mult==0 (or default no-decay keys) -> no decay
    def decay_mult(ps: str) -> float:
        m = _match_custom_keys(ps, custom_keys, "decay_mult", 1.0)
        if m == 1.0 and any(k in ps for k in DEFAULT_NO_DECAY_KEYS):
            return 0.0
        return m

    wd_mask = traverse_util.unflatten_dict(
        {k: decay_mult(ps) > 0.0 for k, ps in paths.items()})
    lr_mults = traverse_util.unflatten_dict(
        {k: _match_custom_keys(ps, custom_keys, "lr_mult", 1.0)
         for k, ps in paths.items()})

    weight_decay = cfg.pop("weight_decay", 0.0)
    if opt_type == "AdamW":
        betas = cfg.pop("betas", (0.9, 0.999))
        tx = optax.adamw(learning_rate=schedule, b1=betas[0], b2=betas[1],
                         eps=cfg.pop("eps", 1e-8), weight_decay=weight_decay,
                         mask=wd_mask)
    elif opt_type in ("SGD", "CopyOfSGD"):
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.sgd(learning_rate=schedule,
                      momentum=cfg.pop("momentum", 0.9),
                      nesterov=cfg.pop("nesterov", False)))
    else:
        raise KeyError(f"unsupported optimizer type {opt_type}")

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    if any(m != 1.0 for m in jax.tree_util.tree_leaves(lr_mults)):
        chain.append(optax.GradientTransformation(
            init=lambda _: optax.EmptyState(),
            update=lambda updates, state, params=None: (
                jax.tree_util.tree_map(lambda u, m: u * m, updates, lr_mults),
                state)))
    tx = optax.chain(*chain) if len(chain) > 1 else chain[0]

    if update_interval > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=update_interval)
    return tx
