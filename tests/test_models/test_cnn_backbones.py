"""CNN-family + TimeSformer backbones (SURVEY §2.2 coverage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """conv3d execution under ``jax_disable_most_optimizations`` is ~4x
    slower than the optimized compile on this host (C3D 16^3: 8.4 s vs
    2.0 s execute) and these tests are execution- not compile-bound; the
    one-time optimized compiles land in the persistent cache."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)

from adapt_image_models_tpu.models.backbones.resnet import (
    ResNet, ResNetTSM, temporal_shift,
)
from adapt_image_models_tpu.models.backbones.resnet3d import (
    ResNet3dSlowOnly, C3D,
)
from adapt_image_models_tpu.models.backbones.timesformer import TimeSformer
from adapt_image_models_tpu.models import build_model


def test_temporal_shift_semantics():
    x = jnp.arange(2 * 4 * 1 * 1 * 8, dtype=jnp.float32).reshape(8, 1, 1, 8)
    y = temporal_shift(x, num_frames=4, shift_div=8)
    xf = np.asarray(x).reshape(2, 4, 1, 1, 8)
    yf = np.asarray(y).reshape(2, 4, 1, 1, 8)
    # channel 0 shifted forward (t sees t+1), zero at the end
    np.testing.assert_allclose(yf[:, :3, ..., 0], xf[:, 1:, ..., 0])
    assert (yf[:, 3, ..., 0] == 0).all()
    # channel 1 shifted backward, zero at the start
    np.testing.assert_allclose(yf[:, 1:, ..., 1], xf[:, :3, ..., 1])
    assert (yf[:, 0, ..., 1] == 0).all()
    # remaining channels untouched
    np.testing.assert_allclose(yf[..., 2:], xf[..., 2:])


def test_resnet18_forward_with_batchstats():
    model = ResNet(depth=18)
    x = jnp.ones((2, 3, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out = model.apply(variables, x)
    assert out.shape == (2, 512)
    # train mode mutates stats
    out2, updates = model.apply(variables, x, deterministic=False,
                                mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_resnet_tsm():
    model = ResNetTSM(depth=18, num_frames=4)
    x = jnp.ones((8, 3, 32, 32))  # B=2, T=4 folded
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (8, 512)
    with pytest.raises(ValueError, match="num_frames"):
        m = ResNetTSM(depth=18)
        m.init(jax.random.PRNGKey(0), x)


def test_slowonly():
    model = ResNet3dSlowOnly(stage_blocks=(1, 1, 1, 1))
    x = jnp.ones((1, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 4, 1, 1, 2048)  # no temporal downsampling


def test_c3d():
    model = C3D()
    # canonical 16x112x112 geometry: structure-only via eval_shape (the
    # real forward is ~50 GFLOPs — on this 1-core host its async dispatch
    # used to land 12s of compute on the NEXT test's clock)
    x = jax.ShapeDtypeStruct((1, 3, 16, 112, 112), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(model.apply, variables, x)
    assert out.shape == (1, 4096)
    # numeric sanity at a small spatial size (fc6/fc7 size-infer; T=16 is
    # the minimum that survives the four temporal pool halvings); init+apply
    # in ONE jitted graph — two separate traces of the conv stack cost ~2x
    # on this host
    xs = jnp.ones((1, 3, 16, 16, 16))
    outs = jax.jit(
        lambda k, x: model.apply(model.init(k, x), x))(
            jax.random.PRNGKey(0), xs)
    assert outs.shape == (1, 4096)
    assert bool(jnp.isfinite(outs).all())


def test_timesformer():
    model = TimeSformer(num_frames=4, img_size=32, patch_size=16,
                        embed_dims=64, num_heads=4, num_transformer_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1, 64)
    assert bool(jnp.isfinite(out).all())


def test_tsn_recognizer_with_resnet():
    cfg = dict(
        type="Recognizer2D",
        backbone=dict(type="ResNet", depth=18),
        cls_head=dict(type="TSNHead", num_classes=5, in_channels=512),
        test_cfg=dict(average_clips="prob"),
    )
    model = build_model(cfg)
    x = jnp.ones((2, 3, 3, 32, 32))  # (B, S, C, H, W)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 5)


def test_slowonly_train_step_with_batchstats():
    """BN models must train through the shared train step (model_state)."""
    from adapt_image_models_tpu.core.train_state import (
        create_train_state, make_train_step,
    )
    from adapt_image_models_tpu.core.optim import build_optimizer
    from adapt_image_models_tpu.parallel.partition import partition_params

    model = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="ResNet3dSlowOnly", stage_blocks=(1, 1, 1, 1)),
        cls_head=dict(type="I3DHead", num_classes=3, in_channels=2048,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob")))
    x = jnp.ones((2, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    mstate = {k: v for k, v in variables.items() if k != "params"}
    trainable, _ = partition_params(params)
    tx = build_optimizer(dict(type="SGD", lr=0.1, weight_decay=0.0),
                         trainable, schedule=0.1)
    state = create_train_state(params, tx, model_state=mstate)
    step = jax.jit(make_train_step(model, tx))
    batch = {"imgs": jnp.ones((2, 1, 3, 4, 32, 32)),
             "label": jnp.array([0, 2])}
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # batch stats must have moved
    a = jax.tree_util.tree_leaves(state.model_state)
    b = jax.tree_util.tree_leaves(state2.model_state)
    assert any(not np.allclose(np.asarray(x1), np.asarray(x2))
               for x1, x2 in zip(a, b))


def test_csn():
    from adapt_image_models_tpu.models.backbones.resnet3d import ResNet3dCSN
    model = ResNet3dCSN(stage_blocks=(1, 1, 1, 1))
    x = jnp.ones((1, 3, 4, 32, 32))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    out = model.apply(variables, x)
    assert out.shape[-1] == 2048
    # depthwise conv2: kernel last-but-one dim is 1 (feature groups)
    k = variables["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape[-2] == 1


def test_resnet_audio():
    from adapt_image_models_tpu.models.backbones.resnet3d import ResNetAudio
    model = ResNetAudio(depth=50)
    x = jnp.ones((2, 1, 96, 80))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1024)  # 32 * 2**3 * 4


def test_frozen_stages_excluded_from_trainable_partition():
    """frozen_stages weights must sit in the FROZEN tree (weight decay on
    the trainable tree would drift stop-gradient'd params otherwise)."""
    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.models import build_backbone
    from adapt_image_models_tpu.parallel.partition import partition_params
    bb = build_backbone(dict(type="ResNet3dSlowOnly", stage_blocks=(1, 1),
                             inflate=(0, 1), frozen_stages=1))
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 4, 32, 32)))
    prefixes = ("conv1", "bn1", "layer1_")
    trainable, frozen = partition_params(v["params"],
                                         frozen_prefixes=prefixes)
    from flax import traverse_util
    tkeys = {"/".join(k) for k in traverse_util.flatten_dict(trainable)}
    fkeys = {"/".join(k) for k in traverse_util.flatten_dict(frozen)}
    assert any(k.startswith("layer2_") for k in tkeys)
    assert all(not k.startswith(("conv1", "bn1", "layer1_")) for k in tkeys)
    assert any(k.startswith("layer1_") for k in fkeys)


def test_nonlocal_modes_and_per_block_placement():
    """Reference nl recipes (i3d_nl_{gaussian,embedded_gaussian,dot_product})
    insert a NonLocal3d after flagged blocks; all three affinity modes must
    run and be identity at init (zero-init output BN scale)."""
    from adapt_image_models_tpu.models import build_backbone
    from flax import traverse_util
    x = jnp.ones((1, 3, 4, 32, 32))
    for mode in ("gaussian", "embedded_gaussian", "dot_product"):
        bb = build_backbone(dict(
            type="ResNet3d", stage_blocks=(1, 2), inflate=(0, 1),
            non_local=((0,), (0, 1)),
            non_local_cfg=dict(mode=mode, sub_sample=True)))
        v = bb.init(jax.random.PRNGKey(0), x)
        keys = {"/".join(k) for k in
                traverse_util.flatten_dict(v["params"])}
        assert any(k.startswith("layer2_1_nonlocal") for k in keys), keys
        assert not any("layer1" in k and "nonlocal" in k for k in keys)
        out = bb.apply(v, x)
        # identity at init: zero-scaled output BN leaves the trunk value
        ref = build_backbone(dict(type="ResNet3d", stage_blocks=(1, 2),
                                  inflate=(0, 1)))
        vref = ref.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref.apply(vref, x)),
                                   atol=1e-6)


def test_resnet_tsm_nonlocal_2d():
    """tsm_nl recipes put non-local on the 2D TSM trunk, folding segments
    into the affinity's temporal axis (reference resnet_tsm.py NL3DWrapper)."""
    from flax import traverse_util
    model = ResNetTSM(depth=18, num_frames=4, stage_blocks=(1, 2, 1, 1),
                      non_local=((0,), (1, 0), (0,), (0,)),
                      non_local_cfg=dict(mode="embedded_gaussian"))
    x = jnp.ones((8, 3, 32, 32))  # B=2 clips x 4 segments
    v = model.init(jax.random.PRNGKey(0), x)
    keys = {"/".join(k) for k in traverse_util.flatten_dict(v["params"])}
    assert any(k.startswith("layer2_0_nonlocal") for k in keys)
    out = model.apply(v, x)
    assert out.shape == (8, 512)


def test_resnet_tsm_temporal_pool_halves_segments():
    """tsm_temporal_pool recipe: stride-2 temporal max-pool after stage 2;
    the recognizer's consensus then runs over T/2 segments."""
    from adapt_image_models_tpu.models import build_model
    model = build_model(dict(
        type="Recognizer2D",
        backbone=dict(type="ResNetTSM", depth=18, num_frames=8,
                      stage_blocks=(1, 1, 1, 1), temporal_pool=True),
        cls_head=dict(type="TSMHead", num_classes=5, in_channels=512,
                      num_segments=8, dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    ))
    x = jnp.ones((2, 8, 3, 32, 32))
    v = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(v, x, deterministic=True)
    assert logits.shape == (2, 5)
    # the backbone itself must return half the segment rows
    bb_out = model.apply(v, x.reshape(16, 3, 32, 32), deterministic=True,
                         method=lambda m, z, deterministic:
                         m.backbone_module(z, deterministic=deterministic))
    assert bb_out.shape[0] == 8  # 16 segment rows -> 8 after the pool
