"""Round-3 recipe families: the new configs must not just build (the sweep
covers that) but drive a train/eval step through the exact model the config
describes, on synthetic fixtures (VERDICT item 5 'Done =' criterion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.config import Config
from adapt_image_models_tpu.models import build_model

REPO = __file__.rsplit("/tests/", 1)[0]


def _model_from(path, _model_overrides=None, **backbone_overrides):
    cfg = Config.fromfile(f"{REPO}/configs/{path}")
    model_cfg = dict(cfg["model"])
    model_cfg.pop("train_cfg", None)
    test_cfg = model_cfg.pop("test_cfg", None)
    if backbone_overrides and "backbone" in model_cfg:
        model_cfg["backbone"] = dict(model_cfg["backbone"],
                                     **backbone_overrides)
    model_cfg.update(_model_overrides or {})
    return cfg, build_model(model_cfg, test_cfg=test_cfg)


def test_bmn_config_train_step():
    """BMN ActivityNet recipe: one loss+grad step on synthetic features
    (reference configs/localization/bmn/...9e_activitynet_feature.py)."""
    from adapt_image_models_tpu.models.losses.bmn_loss import BMNLoss
    from adapt_image_models_tpu.models.localizers.bmn import (
        _bm_valid_mask, generate_bmn_labels,
    )
    # tiny dims: the full 400x100 BMN's (T, S, T, T) sampling constant is
    # ~384 MB and minutes of CPU compile; the config wiring is what's under
    # test here (the full-dim model is covered by the sweep build)
    cfg, model = _model_from(
        "localization/bmn/bmn_400x100_2x8_9e_activitynet_feature.py",
        _model_overrides=dict(temporal_dim=20, feat_dim=16))
    assert cfg["total_epochs"] == 9
    t_dim = model.temporal_dim
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, model.feat_dim, t_dim)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats)
    labels_np = generate_bmn_labels([(0.2, 0.5)], t_dim)
    labels = {k: jnp.asarray(v)[None] for k, v in labels_np.items()}
    bm_mask = jnp.asarray(_bm_valid_mask(t_dim))
    loss_fn = BMNLoss()

    def total(params):
        out = model.apply({"params": params}, feats)
        return loss_fn(out, labels, bm_mask)["loss"]

    loss, grads = jax.jit(jax.value_and_grad(total))(variables["params"])
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.abs(g).sum())
             for g in jax.tree_util.tree_leaves(grads))
    assert gn > 0


def test_bsn_tem_config_train_step():
    """BSN TEM recipe: loss + grads on synthetic snippet features."""
    cfg, model = _model_from(
        "localization/bsn/bsn_tem_400x100_1x16_20e_activitynet_feature.py",
        _model_overrides=dict(temporal_dim=24, tem_feat_dim=16,
                              tem_hidden_dim=16))
    t_dim = model.temporal_dim
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, model.tem_feat_dim, t_dim)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(variables, feats)  # (B, 3, T) action/start/end
    assert out.shape == (2, 3, t_dim)

    rng = np.random.default_rng(1)
    labels = {k: jnp.asarray(rng.uniform(size=(2, t_dim)) > 0.7,
                             jnp.float32)
              for k in ("label_action", "label_start", "label_end")}

    def loss_fn(params):
        o = model.apply({"params": params}, feats)
        losses = model.loss(o, labels)
        return sum(losses.values())

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))


def test_audio_config_recognizer_eval_step(tmp_path):
    """Audio recipe: AudioFeatureDataset sample -> AudioRecognizer scores
    through the config's own pipeline (tiny backbone override for speed)."""
    from adapt_image_models_tpu.data.datasets import AudioFeatureDataset
    cfg, model = _model_from(
        "recognition/audio/resnet_audio_r50_64x1x1_100e_kinetics400_audio.py",
        depth=18, base_channels=8)
    feats = np.random.default_rng(0).normal(size=(200, 80)).astype(np.float32)
    np.save(tmp_path / "a.npy", feats)
    (tmp_path / "ann.txt").write_text("a 200 3\n")
    ds = AudioFeatureDataset(str(tmp_path / "ann.txt"),
                             data_prefix=str(tmp_path),
                             pipeline=cfg["data"]["val"]["pipeline"])
    sample = ds.prepare_sample(0, np.random.default_rng(0))
    x = jnp.asarray(sample["imgs"])[None]  # (B, S, 1, T, F)
    variables = model.init(jax.random.PRNGKey(0), x)
    scores = model.apply(variables, x)
    assert scores.shape[-1] == 400
    assert bool(jnp.isfinite(scores).all())


def test_detection_lfb_config_inherits_and_builds():
    """LFB AVA recipe: _base_ delta must produce an FBO shared head wired
    for the 2048+512 fused bbox input."""
    cfg = Config.fromfile(
        f"{REPO}/configs/detection/lfb/"
        "lfb_nl_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb.py")
    shared = cfg["model"]["roi_head"]["shared_head"]
    assert shared["type"] == "FBOHead"
    assert cfg["model"]["roi_head"]["bbox_head"]["in_channels"] == 2560
    assert shared["lfb_cfg"]["window_size"] == 60
    # base keys must survive the merge
    assert cfg["model"]["backbone"]["type"] == "ResNet3dSlowOnly"


def test_vitclip_flagship_config_trains_and_evals(tmp_path):
    """The fork's same-named flagship recipe (vitclip_base_k400 — the
    ViT_CLIP variant since the round-3 identity fix) must drive the full
    train_model/run_evaluation path, not just build. Tiny geometry, the
    recipe's own pipeline shapes scaled down."""
    from adapt_image_models_tpu.apis.train import train_model
    from adapt_image_models_tpu.apis.test import run_evaluation

    cfg = Config.fromfile(
        f"{REPO}/configs/recognition/vit/vitclip_base_k400.py").to_dict()
    assert cfg["model"]["backbone"]["type"] == "ViT_CLIP"
    cfg["model"]["backbone"].update(
        input_resolution=32, width=32, layers=1, heads=2, num_frames=4,
        compute_dtype="float32", attention_core="xla")
    cfg["model"]["cls_head"].update(num_classes=3, in_channels=32)
    cfg["model"]["test_cfg"]["max_testing_views"] = None
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(f"synthetic://{i} {i % 3}" for i in range(16)))
    for split in ("train", "val", "test"):
        ds = cfg["data"][split]
        ds.update(ann_file=str(ann), data_prefix=None)
        pipe = []
        for s in ds["pipeline"]:
            s = dict(s)
            if s["type"] == "SampleFrames":
                s.update(clip_len=4, frame_interval=2, num_clips=1)
            if s["type"] == "Resize" and -1 in tuple(s.get("scale", ())):
                s["scale"] = (-1, 36)
            elif s["type"] == "Resize":
                s["scale"] = (32, 32)
            if s["type"] in ("CenterCrop", "ThreeCrop"):
                s = dict(type="CenterCrop", crop_size=32)
            if s["type"] == "RandomResizedCrop":
                continue
            pipe.append(s)
        ds["pipeline"] = pipe
    cfg["data"]["videos_per_gpu"] = 2
    cfg["total_epochs"] = 1
    cfg["evaluation"] = dict(interval=1)
    cfg["work_dir"] = str(tmp_path / "work")
    cfg["lr_config"] = dict(policy="CosineAnnealing", min_lr=0)
    state, history = train_model(cfg, validate=True, seed=0)
    assert np.isfinite(history[-1]["loss"])
    res = run_evaluation(cfg, params=state.params, split="test")
    assert "top1_acc" in res and 0.0 <= res["top1_acc"] <= 1.0
