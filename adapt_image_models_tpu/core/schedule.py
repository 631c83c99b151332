"""LR schedules (reference: mmcv LrUpdaterHook configs + custom
``TINLrUpdaterHook``, ``mmaction/core/scheduler/lr_updater.py:6-39``).

All schedules are pure ``step -> lr`` functions consumable by optax.
The AIM recipe (``vitclip_base_k400.py:107-113``): CosineAnnealing to 0 with
2.5-epoch linear warmup (mmcv default ``warmup_ratio=0.1``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def cosine_annealing(base_lr: float, total_steps: int, min_lr: float = 0.0,
                     warmup_steps: int = 0, warmup_ratio: float = 0.1):
    """mmcv CosineAnnealing + linear warmup semantics."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        progress = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cos_lr = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * progress))
        if warmup_steps <= 0:
            return cos_lr
        # mmcv linear warmup: lr * (1 - (1 - k/K) * (1 - ratio))
        frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        warm = cos_lr * (1.0 - (1.0 - frac) * (1.0 - warmup_ratio))
        return jnp.where(step < warmup_steps, warm, cos_lr)

    return schedule


def step_lr(base_lr: float, steps_per_epoch: int, step_epochs: Sequence[int],
            gamma: float = 0.1, warmup_steps: int = 0,
            warmup_ratio: float = 0.1):
    """mmcv 'step' policy."""
    boundaries = [int(e * steps_per_epoch) for e in step_epochs]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        exp = jnp.zeros((), jnp.float32)
        for b in boundaries:
            exp = exp + (step >= b).astype(jnp.float32)
        lr = base_lr * (gamma ** exp)
        if warmup_steps <= 0:
            return lr
        frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        warm = lr * (1.0 - (1.0 - frac) * (1.0 - warmup_ratio))
        return jnp.where(step < warmup_steps, warm, lr)

    return schedule


def tin_lr(base_lr: float, total_steps: int, min_lr: float = 0.0,
           warmup_steps: int = 0, warmup_ratio: float = 0.1):
    """TINLrUpdaterHook: cosine target with warmup ramping from
    ``warmup_ratio * base_lr`` linearly (reference ``lr_updater.py:15-39``)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        progress = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        target = min_lr + 0.5 * (base_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * progress))
        if warmup_steps <= 0:
            return target
        frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        warm = warmup_ratio * base_lr + (target - warmup_ratio * base_lr) * frac
        return jnp.where(step < warmup_steps, warm, target)

    return schedule


def build_schedule(lr_config: dict, base_lr: float, total_epochs: int,
                   steps_per_epoch: int):
    """Build from an mmcv-style ``lr_config`` dict."""
    cfg = dict(lr_config)
    policy = cfg.pop("policy", "CosineAnnealing")
    total_steps = total_epochs * steps_per_epoch
    warmup_steps = 0
    if cfg.get("warmup") == "linear":
        wi = cfg.get("warmup_iters", 0)
        if cfg.get("warmup_by_epoch", False):
            warmup_steps = int(wi * steps_per_epoch)
        else:
            warmup_steps = int(wi)
    warmup_ratio = cfg.get("warmup_ratio", 0.1)
    if policy == "CosineAnnealing":
        return cosine_annealing(base_lr, total_steps,
                                min_lr=cfg.get("min_lr", 0.0),
                                warmup_steps=warmup_steps,
                                warmup_ratio=warmup_ratio)
    if policy == "step":
        return step_lr(base_lr, steps_per_epoch, cfg.get("step", []),
                       gamma=cfg.get("gamma", 0.1),
                       warmup_steps=warmup_steps, warmup_ratio=warmup_ratio)
    if policy == "TIN":
        return tin_lr(base_lr, total_steps, min_lr=cfg.get("min_lr", 0.0),
                      warmup_steps=warmup_steps, warmup_ratio=warmup_ratio)
    raise KeyError(f"unsupported lr policy {policy}")
