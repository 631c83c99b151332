"""BSN (TEM/PEM) + PGM proposal utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.localizers.bsn import (
    TEM, PEM, generate_tem_labels,
)
from adapt_image_models_tpu.core.proposals import (
    temporal_iou, temporal_iop, generate_candidate_proposals,
    generate_bsp_feature, post_processing,
)

T = 20


def test_temporal_iou_iop():
    # identical segments: iou = iop = 1
    assert temporal_iou(0.2, 0.5, 0.2, 0.5) == pytest.approx(1.0)
    assert temporal_iop(0.2, 0.5, 0.2, 0.5) == pytest.approx(1.0)
    # proposal inside gt: iop = 1, iou = len ratio
    assert temporal_iop(0.3, 0.4, 0.2, 0.6) == pytest.approx(1.0)
    assert temporal_iou(0.3, 0.4, 0.2, 0.6) == pytest.approx(0.25)
    # disjoint
    assert temporal_iou(0.0, 0.1, 0.5, 0.6) == pytest.approx(0.0)


def test_tem_forward_loss_grads():
    model = TEM(temporal_dim=T, tem_feat_dim=16, tem_hidden_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, T))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 3, T)
    assert float(out.min()) >= 0 and float(out.max()) <= 1

    labels_np = generate_tem_labels([(0.2, 0.6)], T, boundary_ratio=0.1)
    labels = {k: jnp.asarray(v)[None].repeat(2, 0)
              for k, v in labels_np.items()}

    def total(params):
        o = model.apply({"params": params}, x)
        losses = model.loss(o, labels)
        return losses["loss_action"] + losses["loss_start"] + losses["loss_end"]

    loss, grads = jax.jit(jax.value_and_grad(total))(variables["params"])
    assert np.isfinite(float(loss))
    assert sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads)) > 0


def test_tem_label_semantics():
    labels = generate_tem_labels([(0.25, 0.75)], T, boundary_ratio=0.1)
    action = labels["label_action"]
    # snippets fully inside the action have score 1; far outside, 0
    assert action[10] == pytest.approx(1.0)
    assert action[0] == pytest.approx(0.0)
    # start score peaks near t=0.25 (snippet index 5), end near index 15
    assert np.argmax(labels["label_start"]) in (4, 5)
    assert np.argmax(labels["label_end"]) in (14, 15)
    # no gt -> all zeros
    empty = generate_tem_labels(np.zeros((0, 2)), T, 0.1)
    assert not empty["label_action"].any()


def test_pem_forward_and_loss():
    model = PEM(pem_feat_dim=32, pem_hidden_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (40, 32))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out.shape == (40,)
    ref_iou = jnp.asarray(np.random.default_rng(0).uniform(0, 1, 40))

    def total(params):
        o = model.apply({"params": params}, x)
        return model.loss(o, ref_iou, jax.random.PRNGKey(2))["temporal_iou_loss"]

    loss, grads = jax.jit(jax.value_and_grad(total))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) >= 0
    assert sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads)) > 0


def test_pgm_candidate_proposals():
    rng = np.random.default_rng(0)
    start = rng.uniform(0.0, 0.3, T).astype(np.float32)
    end = rng.uniform(0.0, 0.3, T).astype(np.float32)
    start[5] = 0.9  # forced peaks
    end[15] = 0.8
    props = generate_candidate_proposals(start, end, peak_threshold=0.5,
                                         gt_segments=[(0.25, 0.78)])
    assert props.shape[1] == 7
    assert len(props) > 0
    # sorted by score descending; top proposal spans the forced peaks
    assert np.all(np.diff(props[:, 4]) <= 1e-6)
    assert props[:, 0].max() < props[:, 1].max()
    # match_iou for the (5, 15) pair should be high vs gt (0.25, 0.78)
    best = props[0]
    assert best[5] > 0.5
    # all proposals have tmin < tmax
    assert np.all(props[:, 0] < props[:, 1])


def test_bsp_features_and_postprocessing():
    rng = np.random.default_rng(1)
    action = rng.uniform(0.2, 1.0, T).astype(np.float32)
    props = np.array([[0.2, 0.6, 0.9, 0.8, 0.72, 0.0, 0.0],
                      [0.1, 0.9, 0.5, 0.5, 0.25, 0.0, 0.0]], np.float32)
    feats = generate_bsp_feature(props, action, num_sample_start=4,
                                 num_sample_end=4, num_sample_action=8)
    assert feats.shape == (2, 16)
    assert np.isfinite(feats).all()
    # a constant actionness curve must produce (nearly) constant features
    # away from the padded boundary
    flat = generate_bsp_feature(
        np.array([[0.4, 0.6, 1, 1, 1, 0, 0]], np.float32),
        np.ones(T, np.float32), num_sample_start=4, num_sample_end=4,
        num_sample_action=8)
    assert flat.max() <= 1.0 + 1e-6 and flat.min() > 0.9

    pem_scores = np.array([0.9, 0.3], np.float32)
    result = np.stack([props[:, 0], props[:, 1], props[:, 2], props[:, 3],
                       pem_scores, pem_scores * props[:, 2] * props[:, 3]],
                      axis=1)
    out = post_processing(result, dict(duration_second=100.0,
                                       duration_frame=1000,
                                       feature_frame=992),
                          soft_nms_alpha=0.75, soft_nms_low_threshold=0.65,
                          soft_nms_high_threshold=0.9, post_process_top_k=10)
    assert len(out) == 2
    assert out[0]["score"] >= out[1]["score"]
    # segments rescaled to corrected seconds (99.2s)
    assert out[0]["segment"][1] <= 99.2 + 1e-3


def test_bsn_end_to_end_tiny():
    """TEM -> PGM -> BSP -> PEM roundtrip on synthetic features."""
    tem = TEM(temporal_dim=T, tem_feat_dim=8, tem_hidden_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, T))
    tv = tem.init(jax.random.PRNGKey(1), x)
    scores = np.asarray(tem.apply(tv, x))[0]  # (3, T)
    props = generate_candidate_proposals(scores[1], scores[2],
                                         peak_threshold=0.3)
    feats = generate_bsp_feature(props, scores[0], num_sample_start=8,
                                 num_sample_end=8, num_sample_action=16)
    assert feats.shape == (len(props), 32)
    pem = PEM(pem_feat_dim=32, pem_hidden_dim=16)
    pv = pem.init(jax.random.PRNGKey(2), jnp.asarray(feats))
    pem_scores = np.asarray(pem.apply(pv, jnp.asarray(feats)))
    out = pem.proposals_from_outputs(pem_scores, props,
                                     dict(video_name="v", duration_second=10))
    assert len(out) > 0
    assert all(0 <= p["segment"][0] <= p["segment"][1] <= 10.0 + 1e-3
               for p in out)


def test_localizers_registered():
    from adapt_image_models_tpu.models import build_model
    m = build_model(dict(type="TEM", temporal_dim=T, tem_feat_dim=8,
                         tem_hidden_dim=8))
    assert isinstance(m, TEM)
    m2 = build_model(dict(type="PEM", pem_feat_dim=16, pem_hidden_dim=8))
    assert isinstance(m2, PEM)
