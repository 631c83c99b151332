

def test_build_model_validates_submodule_types_eagerly():
    """A typo'd backbone/head type must fail at build_model, not at init
    (flax children otherwise only resolve at trace time)."""
    import pytest

    from adapt_image_models_tpu.models import build_model

    with pytest.raises(KeyError, match="NoSuchBackbone is not registered"):
        build_model(dict(type="Recognizer3D",
                         backbone=dict(type="NoSuchBackbone"),
                         cls_head=dict(type="I3DHead", num_classes=4,
                                       in_channels=8)))
    with pytest.raises(KeyError, match="NoSuchHead is not registered"):
        build_model(dict(type="Recognizer3D",
                         backbone=dict(type="C3D"),
                         cls_head=dict(type="NoSuchHead", num_classes=4)))
    # external-source prefixes stay lazy (resolved by build_backbone)
    build_model(dict(type="Recognizer2D",
                     backbone=dict(type="torchvision.resnet18"),
                     cls_head=dict(type="TSNHead", num_classes=4,
                                   in_channels=512)))
