"""AIM_FLASH / AIM_FLASH_WIN variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.backbones.flash_variants import (
    AIM_FLASH, AIM_FLASH_WIN,
)


def test_aim_flash_forward():
    model = AIM_FLASH(input_resolution=32, patch_size=16, width=64, layers=2,
                      heads=4, num_frames=4, drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    from tests.util import zeros_init
    params = zeros_init(model, x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 64)
    assert bool(jnp.isfinite(out).all())


def test_aim_flash_no_prompt():
    model = AIM_FLASH(input_resolution=32, patch_size=16, width=64, layers=1,
                      heads=4, num_frames=4, drop_path_rate=0.0, prompt=False)
    x = jnp.ones((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 4, 64)


@pytest.mark.parametrize("win_prompt", [False, True])
def test_aim_flash_win(win_prompt):
    model = AIM_FLASH_WIN(input_resolution=32, patch_size=16, width=64,
                          layers=2, heads=4, num_frames=4,
                          drop_path_rate=0.0, window_size=(4, 2, 2),
                          not_shift=False, win_prompt=win_prompt)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 32, 32))
    from tests.util import zeros_init
    params = zeros_init(model, x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 64)
    assert bool(jnp.isfinite(out).all())


def test_clip_converter_fits_flash():
    torch = pytest.importorskip("torch")
    from tests.golden.torch_aim_golden import GoldenAIM
    from adapt_image_models_tpu.convert import load_clip_into_params
    golden = GoldenAIM(res=32, patch=16, d=64, heads=4, layers=2, frames=4)
    clip_sd = {k: v for k, v in golden.state_dict().items()
               if "Adapter" not in k and "temporal_embedding" not in k}
    model = AIM_FLASH(input_resolution=32, patch_size=16, width=64, layers=2,
                      heads=4, num_frames=4)
    x = jnp.zeros((1, 3, 4, 32, 32))
    from tests.util import zeros_init
    variables = zeros_init(model, x)
    merged = load_clip_into_params(variables["params"], clip_sd, layers=2,
                                   backbone_path=())
    out = model.apply({"params": merged}, x)
    assert out.shape == (1, 4, 64)


def test_aim_flash_dual():
    from adapt_image_models_tpu.models.backbones.flash_variants import (
        AIM_FLASH_DUAL,
    )
    model = AIM_FLASH_DUAL(input_resolution=32, patch_size=16, width=64,
                           layers=2, heads=4, num_frames=4,
                           drop_path_rate=0.0, window_size=(4, 2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 64)
    assert bool(jnp.isfinite(out).all())
    # frozen main stream: gradients w.r.t. frozen attn weights through the
    # dual path must be blocked by stop_gradient... verified indirectly by a
    # grad pass being finite
    def loss(p):
        return jnp.sum(model.apply(p, x) ** 2)
    g = jax.jit(jax.grad(lambda p: loss(p)))(params)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))
