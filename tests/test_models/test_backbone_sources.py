"""Source-prefixed backbone configs (torchvision./timm./mmcls.) resolve to
native equivalents (reference recognizers/base.py:42-75)."""

import jax
import jax.numpy as jnp
import pytest

from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.models.backbone_sources import (
    resolve_backbone_source,
)


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """DenseNet/ResNeXt forwards are conv-execution-bound on this host;
    optimized compiles (persistently cached) beat
    jax_disable_most_optimizations (see test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)


def test_torchvision_resnet_resolves():
    out = resolve_backbone_source(dict(type="torchvision.resnet50"))
    assert out == dict(type="ResNet", depth=50)


def test_timm_swin_resolves_with_arch_kwargs():
    out = resolve_backbone_source(
        dict(type="timm.swin_base_patch4_window7_224"))
    assert out["type"] == "SwinTransformer2D"
    assert out["embed_dim"] == 128 and out["depths"] == (2, 2, 18, 2)


def test_explicit_keys_override_arch_table():
    out = resolve_backbone_source(
        dict(type="timm.swin_tiny_patch4_window7_224", window_size=8))
    assert out["window_size"] == 8


def test_mmcls_prefix_uses_registry():
    assert resolve_backbone_source(
        dict(type="mmcls.ResNet", depth=18)) == dict(type="ResNet", depth=18)
    # the rn101_32x4d recipe's backbone (reference
    # tsn_rn101_32x4d_320p_1x1x3_100e_kinetics400_rgb.py)
    out = resolve_backbone_source(
        dict(type="mmcls.ResNeXt", depth=101, groups=32, width_per_group=4,
             num_stages=4, out_indices=(3,), style="pytorch"))
    assert out["type"] == "ResNeXt" and out["groups"] == 32
    with pytest.raises(KeyError, match="mmcls.NoSuchNet"):
        resolve_backbone_source(dict(type="mmcls.NoSuchNet"))


def test_unknown_name_lists_supported():
    with pytest.raises(KeyError, match="densenet161"):
        resolve_backbone_source(dict(type="torchvision.densenet999"))


def test_torchvision_densenet161_resolves():
    out = resolve_backbone_source(dict(type="torchvision.densenet161"))
    assert out == dict(type="DenseNet", depth=161)


def test_resnext_mid_widths_and_features():
    """ResNeXt-101 32x4d: stage-1 bottleneck mid width 128, trunk out 2048
    (mmcls resnext.py Bottleneck; torchvision parity)."""
    from flax import traverse_util
    from adapt_image_models_tpu.models.builder import build_backbone
    bb = build_backbone(dict(type="ResNeXt", depth=101, groups=32,
                             width_per_group=4, stage_blocks=(1, 1, 1, 1)))
    x = jnp.ones((2, 3, 32, 32))
    v = bb.init(jax.random.PRNGKey(0), x)
    flat = traverse_util.flatten_dict(v["params"])
    # grouped 3x3: kernel (3, 3, mid/groups, mid) with mid = 128 in stage 1
    k = flat[("layer1_0", "conv2", "kernel")]
    assert k.shape == (3, 3, 128 // 32, 128)
    out = bb.apply(v, x)
    assert out.shape == (2, 2048)


def test_densenet161_tiny_forward_and_full_channels():
    import functools
    from adapt_image_models_tpu.models.builder import build_backbone
    bb = build_backbone(dict(type="DenseNet", depth=161,
                             stage_blocks=(1, 1, 1, 1)))
    x = jnp.ones((2, 3, 32, 32))
    v = bb.init(jax.random.PRNGKey(0), x)
    assert bb.apply(v, x).shape == (2, 102)
    # full densenet161 trunk emits the reference's 2208 channels
    full = build_backbone(dict(type="DenseNet", depth=161))
    spec = jax.ShapeDtypeStruct((1, 3, 64, 64), jnp.float32)
    vs = jax.eval_shape(functools.partial(full.init, jax.random.PRNGKey(0)),
                        spec)
    o = jax.eval_shape(full.apply, vs, spec)
    assert o.shape == (1, 2208)


def test_pretrained_true_rejected():
    with pytest.raises(ValueError, match="local torch checkpoint"):
        resolve_backbone_source(
            dict(type="torchvision.resnet50", pretrained=True))


def test_unprefixed_type_passes_through():
    cfg = dict(type="ResNet", depth=50)
    assert resolve_backbone_source(cfg) == cfg


def test_prefixed_backbone_forward():
    """A torchvision-sourced backbone builds and runs inside Recognizer2D."""
    model = build_model(dict(
        type="Recognizer2D",
        backbone=dict(type="torchvision.mobilenet_v2"),
        cls_head=dict(type="TSNHead", num_classes=5, in_channels=1280,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    ))
    x = jnp.zeros((1, 2, 3, 64, 64))
    from tests.util import zeros_init
    params = zeros_init(model, x)
    out = model.apply(params, x, method=model.forward_test)
    assert out.shape == (1, 5)


def test_custom_backbone_config_builds():
    from adapt_image_models_tpu.config import Config
    cfg = Config.fromfile(
        "configs/recognition/tsn/custom_backbones/"
        "tsn_swin_transformer_video_320p_1x1x3_100e_kinetics400_rgb.py")
    model = build_model(dict(cfg["model"]))
    assert model.backbone["type"] == "timm.swin_base_patch4_window7_224"
