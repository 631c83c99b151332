"""Long-term feature bank: storage, sampling, FBO operators, infer head."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.lfb import LFB, save_lfb
from adapt_image_models_tpu.models.heads.fbo_head import (
    FBOHead, FBONonLocal, FBOAvg, FBOMax, LFBInferHead,
)


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet/conv execution dominates parts of this module on this host;
    optimized compiles (cached persistently) beat
    jax_disable_most_optimizations (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)


C = 16


def _make_bank(tmp_path, mode="train"):
    rng = np.random.default_rng(0)
    bank = {
        "vid_a": {900 + s: rng.normal(size=(3, C)).astype(np.float32)
                  for s in range(10)},
        "vid_b": {900: rng.normal(size=(7, C)).astype(np.float32)},
    }
    save_lfb(str(tmp_path / f"lfb_{mode}.npz"), bank)
    return bank


def test_lfb_save_load_sample(tmp_path):
    bank = _make_bank(tmp_path)
    lfb = LFB(str(tmp_path), max_num_sampled_feat=2, window_size=4,
              lfb_channels=C, dataset_modes="train")
    assert len(lfb) == 2
    feats = lfb["vid_a,0902"]
    assert feats.shape == (4 * 2, C)
    # window [900, 904): all four seconds populated -> 2 sampled each
    assert (np.abs(feats).sum(axis=1) > 0).sum() == 8
    # rows must come from the stored bank (fp16 roundtrip)
    stored = np.concatenate([bank["vid_a"][s] for s in range(900, 904)])
    for row in feats:
        dists = np.abs(stored.astype(np.float16).astype(np.float32)
                       - row).sum(axis=1)
        assert dists.min() < 1e-3
    # out-of-bank seconds zero-padded
    edge = lfb["vid_b,0902"]  # window [900, 904): only 900 exists
    assert (np.abs(edge).sum(axis=1) > 0).sum() == 2
    # vid_b sec 900 has 7 rois, max 2 sampled without replacement
    assert not np.allclose(edge[0], edge[1])


def test_fbo_nonlocal_shapes_and_grads():
    model = FBONonLocal(st_feat_channels=C, lt_feat_channels=C,
                        latent_channels=8, num_non_local_layers=2,
                        st_feat_dropout_ratio=0, lt_feat_dropout_ratio=0)
    st = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, C)),
                     jnp.float32)
    lt = jnp.asarray(np.random.default_rng(1).normal(size=(2, 12, C)),
                     jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), st, lt)
    out = model.apply(variables, st, lt)
    assert out.shape == (2, 1, 8)

    def total(params):
        return jnp.sum(model.apply({"params": params}, st, lt) ** 2)

    g = jax.jit(jax.grad(total))(variables["params"])
    assert sum(float(jnp.abs(x).sum())
               for x in jax.tree_util.tree_leaves(g)) > 0


def test_fbo_avg_max():
    lt = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, C)))
    st = jnp.zeros((2, 1, C))
    avg = FBOAvg().apply(FBOAvg().init(jax.random.PRNGKey(0), st, lt), st, lt)
    np.testing.assert_allclose(np.asarray(avg[:, 0]),
                               np.asarray(lt).mean(axis=1), rtol=1e-6)
    mx = FBOMax().apply(FBOMax().init(jax.random.PRNGKey(0), st, lt), st, lt)
    np.testing.assert_allclose(np.asarray(mx[:, 0]),
                               np.asarray(lt).max(axis=1), rtol=1e-6)


def test_fbo_head_end_to_end():
    head = FBOHead(fbo_cfg=dict(type="non_local", st_feat_channels=C,
                                lt_feat_channels=C, latent_channels=8,
                                num_non_local_layers=1,
                                st_feat_dropout_ratio=0,
                                lt_feat_dropout_ratio=0))
    roi_feat = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 4, 4, C)), jnp.float32)          # (B, R, O, O, C)
    lt_feat = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 3, 10, C)), jnp.float32)            # (B, R, L, C)
    variables = head.init(jax.random.PRNGKey(0), roi_feat, lt_feat)
    out = head.apply(variables, roi_feat, lt_feat)
    assert out.shape == (2, 3, C + 8)
    # identity part is the spatially max-pooled roi feature
    np.testing.assert_allclose(
        np.asarray(out[..., :C]),
        np.asarray(roi_feat.max(axis=(2, 3))), rtol=1e-6)


def test_lfb_infer_head_roundtrip(tmp_path):
    infer = LFBInferHead(str(tmp_path / "lfb"), dataset_mode="train")
    rng = np.random.default_rng(0)
    # two batches of pooled roi features
    infer.collect(rng.normal(size=(3, 4, 4, C)).astype(np.float32),
                  ["vid_x,0901", "vid_x,0901", "vid_x,0905"])
    infer.collect(rng.normal(size=(1, 4, 4, C)).astype(np.float32),
                  ["vid_y,1000"])
    path = infer.save()
    lfb = LFB(str(tmp_path / "lfb"), max_num_sampled_feat=4, window_size=2,
              lfb_channels=C, dataset_modes="train")
    assert len(lfb) == 2
    feats = lfb.sample_long_term_features("vid_x", 901)
    # window [900, 902): sec 901 has 2 rois
    assert (np.abs(feats).sum(axis=1) > 0).sum() == 2


# ---------------------------------------------------------------------------
# shared_head wiring in FastRCNN (round 3: LFB / ACRN detection configs)


def test_fastrcnn_fbo_shared_head():
    """FBOHead as roi shared head: lt_feat input fuses into bbox features
    (reference configs/detection/lfb/lfb_nl_..._ava_rgb.py)."""
    from adapt_image_models_tpu.models import build_model
    model = build_model(dict(
        type="FastRCNN",
        backbone=dict(type="ResNet3dSlowOnly", stage_blocks=(1, 1),
                      inflate=(0, 1), base_channels=8),
        roi_head=dict(
            bbox_roi_extractor=dict(type="SingleRoIExtractor3D",
                                    featmap_stride=8, output_size=4),
            shared_head=dict(
                type="FBOHead",
                lfb_cfg=dict(lfb_prefix_path="/nonexistent",
                             window_size=4, max_num_sampled_feat=2),
                fbo_cfg=dict(type="non_local", st_feat_channels=128,
                             lt_feat_channels=C, latent_channels=16,
                             num_st_feat=1, num_lt_feat=8,
                             num_non_local_layers=1,
                             st_feat_dropout_ratio=0,
                             lt_feat_dropout_ratio=0)),
            bbox_head=dict(type="BBoxHeadAVA", in_channels=144,  # 128+16
                           num_classes=6, dropout_ratio=0)),
    ))
    imgs = jnp.ones((2, 3, 4, 32, 32))
    rois = jnp.asarray([[[0, 0, 16, 16], [8, 8, 24, 24]]] * 2, jnp.float32)
    lt = jnp.ones((2, 2, 8, C))
    variables = model.init(jax.random.PRNGKey(0), imgs, rois, lt)
    out = model.apply(variables, imgs, rois, lt)
    assert out.shape == (2, 2, 6)
    assert bool(jnp.isfinite(out).all())


def test_fastrcnn_acrn_shared_head():
    """ACRNHead between RoIAlign and BBoxHeadAVA; tuple (SlowFast) backbone
    features fuse by channel concat (reference configs/detection/acrn/)."""
    from adapt_image_models_tpu.models import build_model
    model = build_model(dict(
        type="FastRCNN",
        backbone=dict(type="ResNet3dSlowFast", stage_blocks=(1, 1, 1, 1),
                      alpha=4, base_channels=8),
        roi_head=dict(
            bbox_roi_extractor=dict(type="SingleRoIExtractor3D",
                                    featmap_stride=16, output_size=4),
            shared_head=dict(type="ACRNHead", in_channels=576,
                             out_channels=32),
            bbox_head=dict(type="BBoxHeadAVA", in_channels=32,
                           num_classes=6, dropout_ratio=0)),
    ))
    imgs = jnp.ones((1, 3, 8, 64, 64))
    rois = jnp.asarray([[[0, 0, 32, 32], [16, 16, 48, 48]]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, rois)
    out = model.apply(variables, imgs, rois)
    assert out.shape == (1, 2, 6)
    assert bool(jnp.isfinite(out).all())


def test_lfb_mmap_backend(tmp_path):
    """Memory-mapped bank (the reference lmdb device analog,
    common/lfb.py:60-90): row file + index, readers touch only sampled
    rows; sampling output matches the RAM backend's key coverage."""
    from adapt_image_models_tpu.models.lfb import save_lfb_mmap
    bank = _make_bank(tmp_path)  # also writes lfb_train.npz
    save_lfb_mmap(str(tmp_path / "lfb_train"), bank)
    (tmp_path / "lfb_train.npz").unlink()  # force the mmap path
    lfb = LFB(str(tmp_path), max_num_sampled_feat=2, window_size=4,
              lfb_channels=C, dataset_modes="train", backend="auto")
    assert lfb._mmap_modes and not lfb.lfb
    assert len(lfb) == 2
    feats = lfb["vid_a,0902"]
    assert feats.shape == (8, C)
    assert (np.abs(feats).sum(axis=1) > 0).sum() == 8
    stored = np.concatenate([bank["vid_a"][s] for s in range(900, 904)])
    for row in feats:
        dists = np.abs(stored.astype(np.float16).astype(np.float32)
                       - row).sum(axis=1)
        assert dists.min() < 1e-3
    # out-of-bank window zero-padded, same as ram backend
    edge = lfb["vid_b,0902"]
    assert (np.abs(edge).sum(axis=1) > 0).sum() == 2
