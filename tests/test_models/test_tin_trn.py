"""TIN backbone, TRN head, OmniSource round-robin loader, patch-shift rf=4."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.resnet_tin import (
    ResNetTIN, TemporalInterlace,
)
from adapt_image_models_tpu.models.heads.trn_head import (
    TRNHead, _relation_subsets,
)
from adapt_image_models_tpu.models.backbones.vit_clip import patch_shift
from adapt_image_models_tpu.data.loader import RoundRobinLoader


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet/conv execution dominates parts of this module on this host;
    optimized compiles (cached persistently) beat
    jax_disable_most_optimizations (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)



def test_temporal_interlace():
    m = TemporalInterlace(num_segments=4, shift_div=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 6, 16))
    variables = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(variables, x)
    assert out.shape == x.shape
    # non-interlaced channels untouched
    np.testing.assert_array_equal(np.asarray(out[..., 4:]),
                                  np.asarray(x[..., 4:]))
    assert bool(jnp.isfinite(out).all())


def test_resnet_tin():
    # depth 18: the TIN-specific machinery (TemporalInterlace + per-block
    # wrapping) is depth-independent and Bottleneck is covered by the plain
    # ResNet tests; depth 50 compiled ~8 s longer on the 1-core host
    model = ResNetTIN(depth=18, num_segments=4)
    x = jnp.ones((4, 3, 32, 32))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    out = model.apply(variables, x)
    assert out.shape == (4, 512)


def test_relation_subsets():
    subs = _relation_subsets(8, 3, max_relations=3)
    assert len(subs) == 3
    assert all(len(s) == 3 for s in subs)
    assert len(set(subs)) == 3


def test_trn_head():
    head = TRNHead(num_classes=5, in_channels=16, num_segments=4,
                   hidden_dim=8, dropout_ratio=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    variables = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(variables, x)
    assert out.shape == (2, 5)
    with pytest.raises(ValueError, match="segments"):
        head.apply(variables, jnp.ones((2, 6, 16)))


def test_patch_shift_rf4():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, 8))
    y = patch_shift(x, rf=4)
    z = patch_shift(y, inv=True, rf=4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), rtol=1e-6)
    with pytest.raises(ValueError):
        patch_shift(x, rf=5)


class _FakeLoader:
    def __init__(self, tag, n):
        self.tag, self.n = tag, n

    def set_epoch(self, e):
        pass

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter([f"{self.tag}{i}" for i in range(self.n)])


def test_round_robin_loader():
    rr = RoundRobinLoader([_FakeLoader("a", 3), _FakeLoader("b", 2)])
    out = list(rr)
    assert out == ["a0", "b0", "a1", "b1", "a2", "b0"]  # aux cycles
    assert len(rr) == 6
