"""ViT_ImageNet backbone: shapes + numerical parity via the timm converter."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.vit_imagenet import ViT_ImageNet
from adapt_image_models_tpu.convert.timm_import import load_timm_into_params
from tests.golden.torch_aim_golden import GoldenTimmViT


def tiny(**kw):
    cfg = dict(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
               num_frames=4, drop_path_rate=0.0)
    cfg.update(kw)
    return ViT_ImageNet(**cfg)


def test_forward_shape():
    model = tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 64)


def test_timm_parity():
    """Golden timm-style torch model (random weights, zeroed adapters) must
    match flax ViT_ImageNet after converting its checkpoint-format keys."""
    golden = GoldenTimmViT(res=32, patch=16, d=64, heads=4, layers=2, frames=4)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in golden.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.02, generator=g))
        # adapters off (identity/zero) so only the timm-converted weights act
        for name, p in golden.named_parameters():
            if "Adapter" in name and "D_fc2" in name:
                p.zero_()
            if "temporal_embedding" in name:
                p.zero_()
    golden.eval()
    x_t = torch.randn(1, 3, 4, 32, 32, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = golden(x_t).numpy()

    # timm-format checkpoint: patch_embed.proj.*, blocks.*, norm.*
    sd = {k: v for k, v in golden.state_dict().items()
          if "Adapter" not in k and "temporal_embedding" not in k}

    model = tiny()
    x_j = jnp.asarray(x_t.numpy())
    variables = model.init(jax.random.PRNGKey(0), x_j)
    params = load_timm_into_params(variables["params"], sd, depth=2,
                                   backbone_path=())
    out = model.apply({"params": params}, x_j)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
