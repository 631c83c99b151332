"""Shared test helpers."""

import jax
import jax.numpy as jnp


def zeros_init(model, *args, **kwargs):
    """Zero-valued variables with init's exact structure, WITHOUT running
    init: ``jax.eval_shape`` traces abstractly (no lowering / compile /
    execution), then zeros are materialized per leaf.

    For shape/finiteness-only tests this halves the model-call cost on the
    1-core host (the init compile is skipped entirely). Do NOT use where
    parameter VALUES matter (behavioral parity, convergence, init-property
    tests): zero weights collapse most layers to constants.
    """
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args,
                            **kwargs)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
