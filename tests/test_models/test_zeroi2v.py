"""ZeroI2V variant: head shift algebra, all block configurations, converter fit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.zeroi2v import (
    ViT_CLIP_ZEROI2V, head_shift,
)


def test_head_shift_schedule():
    bt, h, l, hd = 8, 4, 5, 6  # T=8, B=1
    x = jax.random.normal(jax.random.PRNGKey(0), (bt, h, l, hd))
    y = head_shift(x, num_frames=8)
    xf = np.asarray(x).reshape(1, 8, h, l, hd)
    yf = np.asarray(y).reshape(1, 8, h, l, hd)
    np.testing.assert_allclose(yf[:, :, 0], np.roll(xf[:, :, 0], 1, axis=1))
    np.testing.assert_allclose(yf[:, :, 1], np.roll(xf[:, :, 1], -1, axis=1))
    np.testing.assert_allclose(yf[:, :, 2], xf[:, :, 2])  # unshifted heads
    # inverse round-trips
    z = head_shift(y, num_frames=8, inv=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))
    with pytest.raises(ValueError):
        head_shift(x, num_frames=12)


def tiny(**kw):
    cfg = dict(input_resolution=48, patch_size=16, width=64, layers=2,
               heads=4, num_frames=8, drop_path_rate=0.0)
    cfg.update(kw)
    return ViT_CLIP_ZEROI2V(**cfg)


@pytest.mark.parametrize("kw", [
    dict(linear_adapter=True, share_adapter=False, bottleneck=16),
    dict(linear_adapter=True, share_adapter=True, bottleneck=16),
    dict(linear_adapter=False),
    dict(linear_adapter=True, bottleneck=16, with_t_cls_token=True),
    dict(shift_type="psm", linear_adapter=False, with_t_cls_token=True),
])
def test_forward_configs(kw):
    model = tiny(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 48, 48))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 8, 64)
    assert bool(jnp.isfinite(out).all())


def test_linear_adapter_identity_at_init_property():
    """With zero-init up-projections, the STDHA path must still equal the
    per-frame CLIP function at init ONLY through the adapter deltas — but the
    head shift itself mixes frames. Verify adapters contribute nothing:
    share_adapter and per-projection variants agree at init."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 48, 48))
    m1 = tiny(linear_adapter=True, share_adapter=False, bottleneck=16)
    m2 = tiny(linear_adapter=True, share_adapter=True, bottleneck=16)
    p1 = m1.init(jax.random.PRNGKey(1), x)
    p2 = m2.init(jax.random.PRNGKey(1), x)
    o1 = m1.apply(p1, x)
    o2 = m2.apply(p2, x)
    # adapters are identity at init (zero D_fc2) -> identical functions
    # modulo the frozen-weight init randomness; align frozen weights:
    from flax import traverse_util
    f1 = traverse_util.flatten_dict(p1["params"])
    f2 = dict(traverse_util.flatten_dict(p2["params"]))
    for k, v in f1.items():
        if "Adapter" not in "/".join(k):
            f2[k] = v
    # drop p2-only adapter params mismatch handled: apply with merged frozen
    p2m = {"params": traverse_util.unflatten_dict(f2)}
    o2m = m2.apply(p2m, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2m),
                               rtol=1e-4, atol=1e-4)


def test_clip_converter_fits_zeroi2v():
    torch = pytest.importorskip("torch")
    from tests.golden.torch_aim_golden import GoldenAIM
    from adapt_image_models_tpu.convert import load_clip_into_params
    golden = GoldenAIM(res=48, patch=16, d=64, heads=4, layers=2, frames=8)
    clip_sd = {k: v for k, v in golden.state_dict().items()
               if "Adapter" not in k and "temporal_embedding" not in k}
    model = tiny(linear_adapter=True, bottleneck=16)
    x = jnp.zeros((1, 3, 8, 48, 48))
    variables = model.init(jax.random.PRNGKey(0), x)
    merged = load_clip_into_params(variables["params"], clip_sd, layers=2,
                                   backbone_path=())
    out = model.apply({"params": merged}, x)
    assert out.shape == (1, 8, 64)
