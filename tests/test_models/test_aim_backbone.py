"""AIM backbone shape/param-count/zero-init tests
(modeled on the reference's tests/test_models/test_backbones.py strategy:
tiny synthetic inputs, shape + invariant asserts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adapt_image_models_tpu.models.backbones.aim import AIM
from adapt_image_models_tpu.parallel.partition import (
    partition_params, merge_params, count_params, trainable_mask,
)


def tiny_aim(**kw):
    cfg = dict(input_resolution=32, patch_size=16, width=64, layers=2,
               heads=4, num_frames=4, drop_path_rate=0.1)
    cfg.update(kw)
    return AIM(**cfg)


def test_forward_shape():
    model = tiny_aim()
    x = jnp.ones((2, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 64)


def test_num_tadapter_2():
    model = tiny_aim(num_tadapter=2)
    x = jnp.ones((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("T_Adapter_in" in n for n in names)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 64)


def test_zero_init_adapters_make_identity_start():
    """With zero-init D_fc2, AIM at init must equal the frozen CLIP image
    model applied per frame: temporal/adapter branches all contribute 0, so
    per-frame outputs are identical for identical frames."""
    model = tiny_aim(drop_path_rate=0.0)
    rng = jax.random.PRNGKey(1)
    frame = jax.random.normal(rng, (1, 3, 1, 32, 32))
    x = jnp.tile(frame, (1, 1, 4, 1, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)  # (1, 4, 64)
    # identical frames -> identical per-frame features
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]),
                               rtol=1e-5, atol=1e-5)
    # adapters contribute nothing at init: temporal attention output is killed
    # by T_Adapter's zero D_fc2, so different frames must NOT mix at init.
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 32, 32))
    out_joint = model.apply(params, x2)
    per_frame = [
        model.apply(params, jnp.tile(x2[:, :, i:i + 1], (1, 1, 4, 1, 1)))[0, 0]
        for i in range(4)
    ]
    for i in range(4):
        np.testing.assert_allclose(np.asarray(out_joint[0, i]),
                                   np.asarray(per_frame[i]), rtol=1e-4, atol=1e-4)


def test_vitb16_param_counts():
    """Reference: 97M total (incl. 400-class head), ~10.7M tunable in the
    backbone + temporal_embedding + ln_post (vitclip_aim.py:419-435,
    README.md:90)."""
    model = AIM(input_resolution=224, patch_size=16, width=768, layers=12,
                heads=12, num_frames=8)
    x = jax.ShapeDtypeStruct((1, 3, 8, 224, 224), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               jnp.zeros(x.shape, x.dtype)))
    total = count_params(shapes)
    trainable, frozen = partition_params(shapes["params"])
    n_train = count_params(trainable)
    n_frozen = count_params(frozen)
    # CLIP ViT-B/16 visual w/o proj ~= 86M; adapters ~= 10.6M; temporal emb+ln_post small
    assert 95e6 < total < 99e6, total
    assert 10.3e6 < n_train < 11.5e6, n_train
    assert 85e6 < n_frozen < 88e6, n_frozen


def test_partition_merge_roundtrip():
    model = tiny_aim()
    x = jnp.ones((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    t, f = partition_params(params)
    merged = merge_params(t, f)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(merged)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mask = trainable_mask(params)
    n_mask = sum(jax.tree_util.tree_leaves(mask))
    n_train_leaves = len(jax.tree_util.tree_leaves(t))
    assert n_mask == n_train_leaves > 0


def test_dropout_path_trains_stochastically():
    model = tiny_aim(drop_path_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    # perturb away from the zero-init adapters so the dropped branches are
    # non-zero and drop-path has a visible effect
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    o1 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    det = model.apply(params, x, deterministic=True)
    assert o1.shape == det.shape
    # train-mode randomness must differ across rng seeds
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
