"""SSN: STPP head, OHEM loss, dataset sampling + mAP evaluation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet conv execution dominates these tests on this host; optimized
    compiles (cached persistently) beat jax_disable_most_optimizations
    (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)
from adapt_image_models_tpu.models.heads.ssn_head import (
    SSNHead, parse_stage_config, stpp_train_pool, stpp_test_pool,
)
from adapt_image_models_tpu.models.losses.ssn_loss import (
    SSNLoss, ohem_hinge_loss, sampler_layout,
)

K = 4            # classes
C = 16           # feature channels
SEGS = (2, 5, 2)
TRAIN_CFG = dict(ssn=dict(
    sampler=dict(num_per_video=8, positive_ratio=1, background_ratio=1,
                 incomplete_ratio=6),
    loss_weight=dict(comp_loss_weight=0.1, reg_loss_weight=0.1)))


def test_parse_stage_config():
    assert parse_stage_config(1) == ((1,), 1)
    assert parse_stage_config((1, 2)) == ((1, 2), 3)
    with pytest.raises(ValueError):
        parse_stage_config("x")


def test_stpp_train_pool_semantics():
    n, segs = 3, sum(SEGS)
    x = np.random.default_rng(0).normal(size=(n * segs, C)).astype(np.float32)
    sf = np.ones((n, 2), np.float32)
    act, stpp = stpp_train_pool(jnp.asarray(x), jnp.asarray(sf),
                                (1, 1, 1), SEGS)
    assert act.shape == (n, C)
    assert stpp.shape == (n, 3 * C)
    xr = x.reshape(n, segs, C)
    # activity = course-stage mean
    np.testing.assert_allclose(np.asarray(act), xr[:, 2:7].mean(1),
                               rtol=1e-5)
    # stpp parts: each stage mean / its STAGE multiplier (1 here —
    # reference ssn_head.py:74-76 divides per stage, not by the global sum)
    np.testing.assert_allclose(np.asarray(stpp[:, :C]),
                               xr[:, :2].mean(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stpp[:, 2 * C:]),
                               xr[:, 7:].mean(1), rtol=1e-5)


def test_ohem_hinge_loss_selects_hard_examples():
    # group of 4, keep ratio 0.5 -> top-2 hinge losses summed
    pred = jnp.asarray([[0.9], [0.1], [-0.5], [0.4]], jnp.float32)
    labels = jnp.ones(4, jnp.int32)
    loss = ohem_hinge_loss(pred, labels, 1, 0.5, 4)
    # hinges: 0.1, 0.9, 1.5, 0.6 -> top2 = 1.5 + 0.9
    assert float(loss) == pytest.approx(2.4, abs=1e-5)
    # gradient flows only through the selected examples
    g = jax.jit(jax.grad(lambda p: ohem_hinge_loss(p, labels, 1, 0.5, 4)))(pred)
    assert float(g[2, 0]) == pytest.approx(-1.0)
    assert float(g[1, 0]) == pytest.approx(-1.0)
    assert float(g[0, 0]) == 0.0 and float(g[3, 0]) == 0.0


def test_ssn_loss_full():
    ppv, ipv, bpv = sampler_layout(TRAIN_CFG["ssn"]["sampler"])
    assert (ppv, ipv, bpv) == (1, 6, 1)
    n = 2 * 8  # two videos
    rng = np.random.default_rng(0)
    act = jnp.asarray(rng.normal(size=(n, K + 1)), jnp.float32)
    comp = jnp.asarray(rng.normal(size=(n, K)), jnp.float32)
    reg = jnp.asarray(rng.normal(size=(n, K, 2)), jnp.float32)
    ptype = jnp.asarray(([0] + [1] * 6 + [2]) * 2)
    labels = jnp.asarray(rng.integers(1, K + 1, n))
    labels = jnp.where(ptype == 2, 0, labels)
    targets = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)

    loss_fn = SSNLoss()
    losses = jax.jit(lambda *a: loss_fn(*a, TRAIN_CFG))(
        act, comp, reg, ptype, labels, targets)
    for k in ("loss_activity", "loss_completeness", "loss_reg"):
        assert np.isfinite(float(losses[k])), k


def test_ssn_head_train_and_dense_test_consistency():
    """Summing dense per-part scores over all parts with scale 1 must equal
    the train-path completeness fc on the same pooled features."""
    head = SSNHead(in_channels=C, num_classes=K, stpp_cfg=(1, 1, 1),
                   num_segments_list=SEGS, dropout_ratio=0)
    segs = sum(SEGS)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2 * segs, C)),
                    jnp.float32)
    sf = jnp.ones((2, 2), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x, sf)
    act, comp, reg = head.apply(variables, x, sf)
    assert act.shape == (2, K + 1)
    assert comp.shape == (2, K)
    assert reg.shape == (2, K, 2)

    s = 9
    snip = jnp.asarray(np.random.default_rng(2).normal(size=(s, C)),
                       jnp.float32)
    dact, dcomp, dreg = head.apply(variables, snip,
                                   method=head.dense_scores)
    assert dact.shape == (s, K + 1)
    assert dcomp.shape == (s, 3, K)
    assert dreg.shape == (s, 3, K * 2)
    # consistency: a "proposal" covering one snippet per part with scale 1
    # reproduces the train fc applied to that snippet repeated
    one = snip[0:1]
    parts = jnp.concatenate([one / 3, one / 3, one / 3], axis=1)
    train_comp = head.apply(
        variables,
        method=lambda m: m.completeness_fc(parts))
    dense_sum = dcomp[0].sum(axis=0)
    np.testing.assert_allclose(np.asarray(dense_sum),
                               np.asarray(train_comp)[0] * 3
                               - 2 * np.asarray(  # bias counted 3x in sum
                                   head.apply(variables, method=lambda m:
                                              m.completeness_fc.variables
                                              ["params"]["bias"])),
                               rtol=1e-4, atol=1e-5)


def test_stpp_test_pool_shapes():
    s, m = 12, 3
    act = np.random.default_rng(0).normal(size=(s, K + 1)).astype(np.float32)
    comp = np.random.default_rng(1).normal(size=(s, m, K)).astype(np.float32)
    reg = np.random.default_rng(2).normal(size=(s, m, 2 * K)).astype(np.float32)
    ticks = np.array([[0, 2, 8, 11], [1, 3, 6, 9]])
    sfs = np.ones((2, 2), np.float32)
    oa, oc, orr = stpp_test_pool(act, comp, reg, ticks, sfs, (1, 1, 1))
    assert oa.shape == (2, K + 1)
    assert oc.shape == (2, K)
    assert orr.shape == (2, 2 * K)
    np.testing.assert_allclose(oa[0], act[2:8].mean(0), rtol=1e-5)


def _write_proposal_file(tmp_path, num_frames=200):
    content = f"""# 0
video_a
{num_frames}
1
1
2 40 120
4
2 0.95 0.95 42 118
2 0.30 0.80 60 110
0 0.00 0.00 130 190
0 0.00 0.00 5 35
# 1
video_b
{num_frames}
1
1
1 100 180
4
1 0.90 0.90 98 178
1 0.25 0.75 120 170
0 0.00 0.00 10 80
0 0.00 0.00 0 60
"""
    p = tmp_path / "props.txt"
    p.write_text(content)
    return str(p)


def _make_dataset(tmp_path, **kw):
    from adapt_image_models_tpu.data.ssn_dataset import SSNDataset
    return SSNDataset(
        ann_file=_write_proposal_file(tmp_path),
        train_cfg=dict(ssn=dict(
            sampler=dict(num_per_video=8, positive_ratio=1,
                         background_ratio=1, incomplete_ratio=6,
                         add_gt_as_proposals=True),
            assigner=dict(positive_iou_threshold=0.7,
                          incomplete_iou_threshold=0.6,
                          background_iou_threshold=0.05,
                          background_coverage_threshold=0.02,
                          incomplete_overlap_threshold=0.7))),
        body_segments=5, aug_segments=(2, 2), aug_ratio=0.5,
        clip_len=1, frame_interval=1, **kw)


def test_ssn_dataset_train_sampling(tmp_path):
    ds = _make_dataset(tmp_path)
    assert len(ds) == 2
    assert len(ds.positive_pool) >= 2  # gt added as proposals
    assert len(ds.incomplete_pool) == 2
    assert len(ds.background_pool) >= 2
    item = ds.prepare_train(0, rng=np.random.default_rng(0))
    segs = 9
    assert item["proposal_type"].shape == (8,)
    # fixed layout: 1 positive, 6 incomplete, 1 background
    assert list(item["proposal_type"]) == [0] + [1] * 6 + [2]
    assert item["frame_inds"].shape == (8 * segs * 1,)
    assert item["proposal_scale_factor"].shape == (8, 2)
    assert item["reg_targets"].shape == (8, 2)
    # background label forced to 0
    assert item["proposal_labels"][-1] == 0
    assert item["proposal_labels"][0] in (1, 2)
    # reg norm constants: (2, 2) mean/std
    assert ds.reg_norm_consts.shape == (2, 2)
    assert (ds.reg_norm_consts[1] > 0).all()


def test_ssn_dataset_test_mode_and_eval(tmp_path):
    ds = _make_dataset(tmp_path, test_mode=True, test_cfg=dict(ssn=dict(
        evaluater=dict(top_k=100, nms=0.2))))
    item = ds.prepare_test(0)
    assert item["relative_proposal_list"].shape[1] == 2
    assert item["proposal_tick_list"].shape[1] == 4
    assert item["num_snippets"] == len(item["frame_inds"])

    # synthetic perfect results: activity + completeness peaked at gt class
    results = []
    for idx in range(2):
        info = ds.video_infos[idx]
        rel = item if False else ds.prepare_test(idx)
        nprop = len(rel["relative_proposal_list"])
        gt_label = info["gts"][0].label
        act = np.full((nprop, 3), -5.0, np.float32)
        comp = np.full((nprop, 2), -5.0, np.float32)
        # the first proposal is the near-gt one
        act[0, gt_label] = 5.0
        comp[0, gt_label - 1] = 5.0
        results.append(dict(
            relative_proposal_list=rel["relative_proposal_list"],
            activity_scores=act, completeness_scores=comp,
            bbox_preds=None))
    out = ds.evaluate(results, metrics="mAP", iou_range=(0.5,))
    assert out["mAP@0.50"] == pytest.approx(1.0)


def test_ssn_localizer_end_to_end_tiny(tmp_path):
    """Full SSN train forward + loss grads through a tiny 2D backbone."""
    from adapt_image_models_tpu.models import build_model

    model = build_model(dict(
        type="SSN",
        backbone=dict(type="ResNet", depth=18, stage_blocks=(1, 1, 1, 1)),
        cls_head=dict(type="SSNHead", in_channels=512, num_classes=K,
                      stpp_cfg=(1, 1, 1), num_segments_list=SEGS,
                      dropout_ratio=0),
        dropout_ratio=0,
        loss_cls=dict(type="SSNLoss"),
        train_cfg=TRAIN_CFG,
    ))
    # 16x16 inputs: the SSN machinery under test (STPP, OHEM layout, reg
    # loss) is resolution-independent; the ResNet fwd+bwd execution
    # dominated this test's wall time at 32x32 (~11 s)
    segs, npv = 9, 8
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(npv * segs, 16, 16, 3)), jnp.float32)
    sf = jnp.ones((npv, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sf)
    act, comp, reg = model.apply(variables, imgs, sf)
    assert act.shape == (npv, K + 1)
    assert comp.shape == (npv, K)

    ptype = jnp.asarray([0] + [1] * 6 + [2])
    labels = jnp.asarray([2] * 7 + [0])
    targets = jnp.zeros((npv, 2), jnp.float32)

    def total(params):
        losses = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            imgs, sf, ptype, labels, targets,
            method=model.forward_train, deterministic=True)
        return sum(jnp.asarray(v) for v in losses.values())

    loss, grads = jax.jit(jax.value_and_grad(total))(variables["params"])
    assert np.isfinite(float(loss))
    assert sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads)) > 0
