"""Schedule + optimizer-construction semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import traverse_util

from adapt_image_models_tpu.core.schedule import (
    cosine_annealing, build_schedule, step_lr,
)
from adapt_image_models_tpu.core.optim import build_optimizer


def test_cosine_annealing_endpoints():
    s = cosine_annealing(1.0, total_steps=100, min_lr=0.0, warmup_steps=0)
    assert abs(float(s(0)) - 1.0) < 1e-6
    assert abs(float(s(50)) - 0.5) < 1e-6
    assert float(s(100)) < 1e-6


def test_warmup_matches_mmcv_linear():
    # mmcv linear warmup: lr * (1 - (1 - k/K)(1 - ratio))
    s = cosine_annealing(1.0, total_steps=1000, warmup_steps=100,
                         warmup_ratio=0.1)
    cos0 = 0.5 * (1 + np.cos(np.pi * 0 / 1000))
    assert abs(float(s(0)) - cos0 * 0.1) < 1e-6
    # halfway through warmup: factor = 1 - 0.5*0.9 = 0.55
    cos50 = 0.5 * (1 + np.cos(np.pi * 50 / 1000))
    assert abs(float(s(50)) - cos50 * 0.55) < 1e-4
    assert float(s(100)) == pytest.approx(
        0.5 * (1 + np.cos(np.pi * 100 / 1000)), rel=1e-5)


def test_build_schedule_epoch_warmup():
    lr_config = dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                     warmup_by_epoch=True, warmup_iters=2.5)
    s = build_schedule(lr_config, 3e-4, total_epochs=30, steps_per_epoch=100)
    assert float(s(0)) < 3e-4 * 0.2
    assert float(s(250)) == pytest.approx(
        3e-4 * 0.5 * (1 + np.cos(np.pi * 250 / 3000)), rel=1e-4)


def test_step_lr():
    s = step_lr(1.0, steps_per_epoch=10, step_epochs=[2, 4], gamma=0.1)
    assert float(s(5)) == pytest.approx(1.0)
    assert float(s(25)) == pytest.approx(0.1)
    assert float(s(45)) == pytest.approx(0.01, rel=1e-4)


def _toy_params():
    return {
        "backbone_module": {
            "ln_post": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
            "temporal_embedding": jnp.zeros((1, 2, 4)),
            "transformer": {"resblocks": {"S_Adapter": {"D_fc1": {
                "kernel": jnp.ones((4, 1)), "bias": jnp.zeros(1)}}}},
        },
        "head_module": {"fc_cls": {"kernel": jnp.ones((4, 3)),
                                   "bias": jnp.zeros(3)}},
    }


def test_weight_decay_mask():
    params = _toy_params()
    custom = {"ln_post": dict(decay_mult=0.0),
              "temporal_embedding": dict(decay_mult=0.0)}
    tx = build_optimizer(dict(type="AdamW", lr=1.0, weight_decay=0.5,
                              paramwise_cfg=dict(custom_keys=custom)),
                         params, schedule=1.0)
    opt_state = tx.init(params)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, opt_state, params)
    flat = traverse_util.flatten_dict(updates)
    # decayed: adapter kernel + head kernel get -lr*wd*param updates
    assert float(jnp.abs(flat[("head_module", "fc_cls", "kernel")]).sum()) > 0
    # no decay on ln_post scale / temporal_embedding / biases
    assert float(jnp.abs(flat[("backbone_module", "ln_post", "scale")]).sum()) == 0
    assert float(jnp.abs(flat[("backbone_module", "temporal_embedding")]).sum()) == 0
    assert float(jnp.abs(flat[("head_module", "fc_cls", "bias")]).sum()) == 0


def test_lr_mult():
    params = _toy_params()
    custom = {"backbone_module": dict(lr_mult=0.1)}
    tx = build_optimizer(dict(type="AdamW", lr=1.0, weight_decay=0.0,
                              paramwise_cfg=dict(custom_keys=custom)),
                         params, schedule=1.0)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = traverse_util.flatten_dict(updates)
    head = float(flat[("head_module", "fc_cls", "kernel")][0, 0])
    backbone = float(flat[("backbone_module", "transformer", "resblocks",
                           "S_Adapter", "D_fc1", "kernel")][0, 0])
    assert backbone == pytest.approx(head * 0.1, rel=1e-3)


def test_gradient_accumulation():
    params = {"w": jnp.zeros(2)}
    tx = build_optimizer(dict(type="SGD", lr=1.0, weight_decay=0.0,
                              momentum=0.0),
                         params, schedule=0.1, update_interval=2)
    st = tx.init(params)
    g = {"w": jnp.ones(2)}
    up1, st = tx.update(g, st, params)
    assert float(jnp.abs(up1["w"]).sum()) == 0  # accumulating
    up2, st = tx.update(g, st, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), -0.1, rtol=1e-5)
