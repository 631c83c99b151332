"""Numerical parity: torch golden AIM vs flax AIM through the converters.

This is the accuracy-reproduction anchor (SURVEY.md §7 step 1 'hard part 1'):
if the packed-QKV transposes, LN mapping, adapter mapping, or attention math
were wrong anywhere, these tests would diverge.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.convert import (
    convert_clip_visual, load_clip_into_params, load_aim_checkpoint_into_params,
)
from tests.golden.torch_aim_golden import GoldenAIM, GoldenRecognizer


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.02, generator=g))
    return module


def _flax_model(num_classes=10):
    cfg = dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=32, patch_size=16, width=64,
                      layers=2, heads=4, num_frames=4, drop_path_rate=0.0),
        cls_head=dict(type="I3DHead", num_classes=num_classes, in_channels=64,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    )
    return build_model(cfg)


def test_full_aim_checkpoint_parity():
    """Golden torch recognizer (random adapters, non-zero!) == flax after
    converting its state_dict as a released AIM checkpoint."""
    golden = _randomize(GoldenRecognizer(num_classes=10, res=32, patch=16,
                                         d=64, heads=4, layers=2, frames=4))
    golden.eval()
    x_t = torch.randn(2, 3, 4, 32, 32, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = golden(x_t).numpy()

    model = _flax_model()
    x_j = jnp.asarray(x_t.numpy())
    variables = model.init(jax.random.PRNGKey(0), x_j)
    params = load_aim_checkpoint_into_params(
        variables["params"], golden.state_dict())
    out = model.apply({"params": params}, x_j)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_clip_visual_converter_covers_frozen_set():
    """CLIP-only conversion must cover exactly the frozen CLIP weights and
    leave adapters/temporal_embedding at init."""
    golden = _randomize(GoldenAIM(res=32, patch=16, d=64, heads=4, layers=2,
                                  frames=4), seed=3)
    sd = golden.state_dict()
    clip_keys = {k: v for k, v in sd.items() if "Adapter" not in k
                 and "temporal_embedding" not in k}
    tree = convert_clip_visual(clip_keys, layers=2)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(tree)
    joined = {"/".join(k) for k in flat}
    assert ("conv1/kernel" in joined and "ln_post/scale" in joined
            and "transformer/resblocks/attn/in_proj_kernel" in joined)
    assert not any("Adapter" in k for k in joined)
    # stacked layer axis
    assert flat[("transformer", "resblocks", "attn", "in_proj_kernel")].shape == (2, 64, 192)

    model = _flax_model()
    x = jnp.ones((1, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    merged = load_clip_into_params(variables["params"], clip_keys, layers=2)
    # merged conv kernel must equal the transposed torch conv weight
    np.testing.assert_allclose(
        np.asarray(merged["backbone_module"]["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)


def test_clip_loaded_model_matches_per_frame_clip():
    """After loading only CLIP weights (adapters at zero-init), the flax AIM
    must equal the golden torch model whose adapters are ALSO zeroed — i.e.
    both reduce to the plain CLIP image encoder per frame."""
    golden = _randomize(GoldenAIM(res=32, patch=16, d=64, heads=4, layers=2,
                                  frames=4), seed=4)
    with torch.no_grad():  # zero adapters like AIM's init
        for name, p in golden.named_parameters():
            if "Adapter" in name and "D_fc2" in name:
                p.zero_()
            if "temporal_embedding" in name:
                p.zero_()
    golden.eval()
    x_t = torch.randn(1, 3, 4, 32, 32, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        ref = golden(x_t).numpy()  # (1, 4, 64)

    from adapt_image_models_tpu.models.backbones.aim import AIM
    model = AIM(input_resolution=32, patch_size=16, width=64, layers=2,
                heads=4, num_frames=4, drop_path_rate=0.0)
    x_j = jnp.asarray(x_t.numpy())
    variables = model.init(jax.random.PRNGKey(0), x_j)
    clip_sd = {k: v for k, v in golden.state_dict().items()
               if "Adapter" not in k and "temporal_embedding" not in k}
    params = load_clip_into_params(variables["params"], clip_sd, layers=2,
                                   backbone_path=())
    out = model.apply({"params": params}, x_j)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_converter_shape_mismatch_raises():
    golden = GoldenAIM(res=32, patch=16, d=64, heads=4, layers=2, frames=4)
    sd = {k: v for k, v in golden.state_dict().items()
          if "Adapter" not in k and "temporal_embedding" not in k}
    sd["positional_embedding"] = torch.zeros(999, 64)
    from adapt_image_models_tpu.models.backbones.aim import AIM
    model = AIM(input_resolution=32, patch_size=16, width=64, layers=2,
                heads=4, num_frames=4)
    x = jnp.ones((1, 3, 4, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_clip_into_params(variables["params"], sd, layers=2, backbone_path=())
