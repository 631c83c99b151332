"""BMN localizer + loss + proposal metrics + ActivityNet dataset."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.models.localizers.bmn import (
    BMN, soft_nms, generate_bmn_labels, temporal_iou, _bm_valid_mask,
)
from adapt_image_models_tpu.models.losses.bmn_loss import BMNLoss
from adapt_image_models_tpu.core.metrics import (
    pairwise_temporal_iou, average_recall_at_avg_proposals,
)

T = 20


def tiny_bmn():
    return BMN(temporal_dim=T, feat_dim=16, hidden_dim_1d=16,
               hidden_dim_2d=8, hidden_dim_3d=16, num_samples=8,
               num_samples_per_bin=2)


def test_bmn_forward_shapes():
    model = tiny_bmn()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, T))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out["confidence_map"].shape == (2, 2, T, T)
    assert out["start"].shape == (2, T)
    assert out["end"].shape == (2, T)
    assert float(out["start"].min()) >= 0 and float(out["start"].max()) <= 1


def test_bmn_loss_and_gradients():
    model = tiny_bmn()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, T))
    variables = model.init(jax.random.PRNGKey(1), x)
    labels_np = generate_bmn_labels([(0.2, 0.5)], T)
    labels = {k: jnp.asarray(v)[None] for k, v in labels_np.items()}
    bm_mask = jnp.asarray(_bm_valid_mask(T))
    loss_fn = BMNLoss()

    def total(params):
        out = model.apply({"params": params}, x)
        return loss_fn(out, labels, bm_mask)["loss"]

    loss, grads = jax.jit(jax.value_and_grad(total))(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_generate_labels_semantics():
    labels = generate_bmn_labels([(0.25, 0.75)], T)
    conf = labels["label_confidence"]
    # exact-match anchor has IoU 1: start=5, end=15 -> dur idx 9, start idx 5
    assert conf[9, 5] == pytest.approx(1.0, abs=1e-6)
    assert labels["label_start"][5] > 0.5  # boundary region around t=0.25
    assert labels["label_end"][14] > 0.5


def test_soft_nms_suppresses_overlaps():
    props = np.array([
        [0.1, 0.5, 0.9],
        [0.12, 0.52, 0.85],  # heavy overlap with #1
        [0.6, 0.9, 0.8],
    ], np.float32)
    out = soft_nms(props, alpha=0.4, low_threshold=0.3, high_threshold=0.9,
                   top_k=10)
    # the overlapping proposal's score must decay below the disjoint one
    def score_of(tmin):
        return float(out[np.argmin(np.abs(out[:, 0] - tmin)), 2])
    assert score_of(0.6) > score_of(0.12)
    assert score_of(0.12) < 0.85  # actually decayed


def test_proposals_from_outputs():
    model = tiny_bmn()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, T))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    single = {k: np.asarray(v)[0] for k, v in out.items()}
    props = model.proposals_from_outputs(single)
    assert props.ndim == 2 and props.shape[1] == 3
    assert (props[:, 0] < props[:, 1]).all()


def test_ar_at_an():
    gt = {"v1": np.array([[0.2, 0.4]]), "v2": np.array([[0.5, 0.9]])}
    perfect = {"v1": np.array([[0.2, 0.4, 1.0]]),
               "v2": np.array([[0.5, 0.9, 1.0]])}
    _, avg_recall, _, auc = average_recall_at_avg_proposals(gt, perfect, 2)
    assert avg_recall[-1] == pytest.approx(1.0)
    assert auc > 90
    bad = {"v1": np.array([[0.6, 0.8, 1.0]]),
           "v2": np.array([[0.0, 0.1, 1.0]])}
    _, avg_recall_bad, _, auc_bad = average_recall_at_avg_proposals(gt, bad, 2)
    assert avg_recall_bad[-1] == 0.0


def test_activitynet_dataset(tmp_path):
    from adapt_image_models_tpu.data.activitynet import ActivityNetDataset
    ann = {"vid_a": {"duration_second": 10.0,
                     "annotations": [{"segment": [2.0, 4.0], "label": "x"}]}}
    ann_path = tmp_path / "anno.json"
    ann_path.write_text(json.dumps(ann))
    np.save(tmp_path / "vid_a.npy",
            np.random.default_rng(0).normal(size=(37, 16)).astype(np.float32))
    ds = ActivityNetDataset(str(ann_path), data_prefix=str(tmp_path),
                            temporal_dim=T)
    assert len(ds) == 1
    feat = ds.load_feature(0)
    assert feat.shape == (T, 16)
    np.testing.assert_allclose(ds.gt_segments(0), [[0.2, 0.4]])
    res = ds.evaluate({"vid_a": np.array([[0.2, 0.4, 1.0]])})
    assert res["AR@100"] == pytest.approx(1.0)
