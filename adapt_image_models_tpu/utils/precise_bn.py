"""Precise-BN: recompute BatchNorm statistics over the training set
(reference ``mmaction/utils/precise_bn.py:37+``, fvcore-style).

After training, running-average BN stats lag the final weights; this
re-estimates them with true mini-batch moments over ``num_iters`` batches.
Pure-functional: takes/returns the ``model_state`` pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable

import jax
import jax.numpy as jnp
from flax import traverse_util


def compute_precise_bn_stats(model, params, model_state: Dict,
                             batches: Iterable, prepare_fn: Callable,
                             num_iters: int = 200) -> Dict:
    """Average the per-batch BN moments over up to ``num_iters`` batches."""
    if "batch_stats" not in model_state:
        return model_state

    @jax.jit
    def batch_moments(imgs):
        # run a train-mode pass; BN's mutated batch_stats after ONE batch with
        # momentum m satisfy new = m*old + (1-m)*batch -> recover batch moments
        variables = {"params": params, **model_state}
        _, updates = model.apply(variables, imgs, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(0)},
                                 mutable=["batch_stats"])
        old = traverse_util.flatten_dict(model_state["batch_stats"])
        new = traverse_util.flatten_dict(updates["batch_stats"])
        m = 0.9  # all our BN layers use momentum=0.9
        return {k: (new[k] - m * old[k]) / (1.0 - m) for k in new}

    acc = None
    count = 0
    for i, batch in enumerate(batches):
        if i >= num_iters:
            break
        imgs = prepare_fn(jnp.asarray(batch["imgs"]))
        if imgs.ndim == 6:
            imgs = imgs.reshape((-1,) + imgs.shape[2:])
        moments = batch_moments(imgs)
        if acc is None:
            acc = {k: jnp.asarray(v, jnp.float32) for k, v in moments.items()}
        else:
            acc = {k: acc[k] + moments[k] for k in acc}
        count += 1
    if not count:
        return model_state
    averaged = {k: v / count for k, v in acc.items()}
    new_bs = traverse_util.unflatten_dict(averaged)
    return {**model_state, "batch_stats": new_bs}
