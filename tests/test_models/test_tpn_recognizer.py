"""TPN end-to-end: neck wired through both recognizers, aux loss in the
train step (reference ``configs/recognition/tpn/`` +
``mmaction/models/necks/tpn.py`` AuxHead — ``loss_aux`` joins the total)."""

import jax
import jax.numpy as jnp
import optax
import pytest

from adapt_image_models_tpu.core.train_state import (
    create_train_state, make_train_step,
)
from adapt_image_models_tpu.models import build_model

@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet conv execution dominates these tests on this host; optimized
    compiles (cached persistently) beat jax_disable_most_optimizations
    (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)
_NECK = dict(
    type="TPN",
    in_channels=(64, 128),
    out_channels=32,
    spatial_modulation_cfg=dict(in_channels=(64, 128), out_channels=128),
    temporal_modulation_cfg=dict(downsample_scales=(4, 4)),
    upsample_cfg=dict(scale_factor=(1, 1, 1)),
    downsample_cfg=dict(downsample_scale=(1, 1, 1)),
    level_fusion_cfg=dict(in_channels=(32, 32), mid_channels=(32, 32),
                          out_channels=64,
                          downsample_scales=((1, 1, 1), (1, 1, 1))),
    aux_head_cfg=dict(out_channels=5, loss_weight=0.5),
)


def _tpn_slowonly_cfg():
    return dict(
        type="Recognizer3D",
        backbone=dict(type="ResNet3dSlowOnly", depth=18, base_channels=16,
                      stage_blocks=(1, 1, 1, 1), out_indices=(2, 3)),
        neck=dict(_NECK),
        cls_head=dict(type="TPNHead", num_classes=5, in_channels=64,
                      spatial_type="avg",
                      consensus=dict(type="AvgConsensus", dim=1),
                      dropout_ratio=0.5),
    )


def test_tpn_slowonly_forward_and_aux_train():
    model = build_model(_tpn_slowonly_cfg(), test_cfg=dict(average_clips="prob"))
    imgs = jnp.zeros((2, 3, 8, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    logits = model.apply(variables, imgs, deterministic=True)
    assert logits.shape == (2, 5)
    assert bool(jnp.isfinite(logits).all())

    tx = optax.sgd(0.01)
    ms = {k: v for k, v in variables.items() if k != "params"}
    state = create_train_state(variables["params"], tx, model_state=ms)
    step = make_train_step(model, tx)
    batch = {"imgs": jnp.zeros((2, 1, 3, 8, 32, 32)),
             "label": jnp.array([1, 3])}
    state2, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    # uniform logits: loss = CE_main + 0.5 * CE_aux = 1.5 * ln(5)
    assert metrics["loss"] == pytest.approx(1.5 * jnp.log(5.0), rel=1e-3)
    # the aux head's params must receive gradient (loss_aux flows)
    import jax.tree_util as jtu
    moved = [float(jnp.abs(a - b).max()) for (pa, a), (_, b) in zip(
        jtu.tree_leaves_with_path(state.trainable),
        jtu.tree_leaves_with_path(state2.trainable))
        if "aux_fc" in "/".join(str(k) for k in pa)]
    assert moved and max(moved) > 0

    # without the aux cfg the loss is plain CE (no intermediates plumbing)
    cfg = _tpn_slowonly_cfg()
    cfg["neck"] = dict(_NECK, aux_head_cfg=None)
    model_noaux = build_model(cfg, test_cfg=dict(average_clips="prob"))
    v2 = model_noaux.init(jax.random.PRNGKey(0), imgs)
    ms2 = {k: v for k, v in v2.items() if k != "params"}
    state_na = create_train_state(v2["params"], tx, model_state=ms2)
    step_na = make_train_step(model_noaux, tx)
    _, m2 = jax.jit(step_na)(state_na, batch, jax.random.PRNGKey(1))
    assert m2["loss"] == pytest.approx(jnp.log(5.0), rel=1e-3)


def test_tpn_tsm_2d_path():
    """TPN over a 2D TSM backbone: segments become the pyramid's temporal
    axis (reference ``_base_/models/tpn_tsm_r50.py``)."""
    model = build_model(dict(
        type="Recognizer2D",
        backbone=dict(type="ResNetTSM", depth=18, num_frames=4,
                      base_channels=16, stage_blocks=(1, 1, 1, 1),
                      out_indices=(2, 3)),
        neck=dict(type="TPN", in_channels=(64, 128), out_channels=32,
                  temporal_modulation_cfg=dict(downsample_scales=(4, 4)),
                  level_fusion_cfg=dict(mid_channels=(32, 32),
                                        out_channels=64,
                                        downsample_scales=((1, 1, 1),
                                                           (1, 1, 1))),
                  aux_head_cfg=dict(out_channels=5, loss_weight=0.5)),
        cls_head=dict(type="TPNHead", num_classes=5, in_channels=64),
    ), test_cfg=dict(average_clips="prob"))
    imgs = jnp.zeros((2, 4, 3, 32, 32))  # (B, S, C, H, W)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    logits = model.apply(variables, imgs, deterministic=True)
    assert logits.shape == (2, 5)

    tx = optax.sgd(0.01)
    ms = {k: v for k, v in variables.items() if k != "params"}
    state = create_train_state(variables["params"], tx, model_state=ms)
    step = make_train_step(model, tx)
    _, metrics = jax.jit(step)(state, {"imgs": imgs,
                                       "label": jnp.array([1, 3])},
                               jax.random.PRNGKey(1))
    assert metrics["loss"] == pytest.approx(1.5 * jnp.log(5.0), rel=1e-3)


def test_multi_stage_out_indices():
    """out_indices=(2, 3) returns both stage maps on the 2D and 3D ResNets."""
    from adapt_image_models_tpu.models.backbones.resnet import ResNetTSM
    from adapt_image_models_tpu.models.backbones.resnet3d import (
        ResNet3dSlowOnly,
    )
    # shape-only semantics: eval_shape traces without paying the (slow,
    # unoptimized-XLA) conv compute on this 1-core host
    bb = ResNetTSM(depth=18, num_frames=4, out_indices=(2, 3))
    x = jax.ShapeDtypeStruct((4, 3, 32, 32), jnp.float32)
    v = jax.eval_shape(bb.init, jax.random.PRNGKey(0), x)
    f2, f3 = jax.eval_shape(bb.apply, v, x)
    # 32 -> /4 stem -> 8; stages 2/3 sit at /16 and /32
    assert f2.shape == (4, 2, 2, 256) and f3.shape == (4, 1, 1, 512)

    bb3 = ResNet3dSlowOnly(depth=18, base_channels=16, out_indices=(2, 3))
    x3 = jax.ShapeDtypeStruct((1, 3, 4, 32, 32), jnp.float32)
    v3 = jax.eval_shape(bb3.init, jax.random.PRNGKey(0), x3)
    g2, g3 = jax.eval_shape(bb3.apply, v3, x3)
    assert g2.shape[-1] == 64 and g3.shape[-1] == 128
    assert g2.shape[1] == 4 and g3.shape[1] == 4  # no temporal downsampling
