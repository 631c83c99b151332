"""End-to-end tiny training on the 8-device CPU mesh (what the reference's
tests/test_runtime/test_train.py does with ExampleModel — but actually
multi-device, which the reference never tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.apis.train import train_model
from adapt_image_models_tpu.apis.test import run_evaluation
from adapt_image_models_tpu.core.checkpoint import CheckpointManager
from adapt_image_models_tpu.core.train_state import (
    create_train_state, make_train_step,
)
from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.parallel.mesh import make_mesh, shard_batch
from adapt_image_models_tpu.core.optim import build_optimizer
from adapt_image_models_tpu.parallel.partition import partition_params


def tiny_cfg(tmp_path, ann):
    pipe_train = [
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1),
        dict(type="Resize", scale=(-1, 36)),
        dict(type="RandomResizedCrop"),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCTHW"),
    ]
    pipe_test = [
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=2,
             test_mode=True),
        dict(type="Resize", scale=(-1, 32)),
        dict(type="CenterCrop", crop_size=32),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCTHW"),
    ]
    return dict(
        model=dict(
            type="Recognizer3D",
            backbone=dict(type="AIM", input_resolution=32, patch_size=16,
                          width=32, layers=1, heads=2, num_frames=4,
                          drop_path_rate=0.1),
            cls_head=dict(type="I3DHead", num_classes=3, in_channels=32),
            test_cfg=dict(average_clips="prob"),
        ),
        data=dict(
            videos_per_gpu=2, workers_per_gpu=2,
            test_dataloader=dict(videos_per_gpu=1),
            train=dict(type="VideoDataset", ann_file=ann, pipeline=pipe_train),
            val=dict(type="VideoDataset", ann_file=ann, pipeline=pipe_test),
            test=dict(type="VideoDataset", ann_file=ann, pipeline=pipe_test),
        ),
        optimizer=dict(type="AdamW", lr=1e-2, weight_decay=0.05,
                       paramwise_cfg=dict(custom_keys={
                           "ln_post": dict(decay_mult=0.0)})),
        optimizer_config=dict(update_interval=2),
        lr_config=dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                       warmup_by_epoch=True, warmup_iters=1),
        total_epochs=2,
        checkpoint_config=dict(interval=1, max_keep_ckpts=2),
        log_config=dict(interval=1),
        evaluation=dict(interval=2, save_best="top1_acc"),
        work_dir=str(tmp_path / "work"),
    )


@pytest.fixture
def ann(tmp_path):
    p = tmp_path / "ann.txt"
    p.write_text("\n".join(f"synthetic://{i} {i % 3}" for i in range(16)))
    return str(p)


def test_train_model_end_to_end(tmp_path, ann):
    cfg = tiny_cfg(tmp_path, ann)
    state, history = train_model(cfg, validate=True, seed=0)
    assert len(history) > 0
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    # adapters must have moved, frozen CLIP must not
    assert int(state.step) > 0
    # checkpoints written
    mgr = CheckpointManager(cfg["work_dir"])
    assert mgr.latest_epoch() == 2
    # evaluation runs on the final params
    res = run_evaluation(cfg, params=state.params, split="test")
    assert "top1_acc" in res and 0.0 <= res["top1_acc"] <= 1.0


def test_frozen_params_never_move(ann, tmp_path):
    cfg = tiny_cfg(tmp_path, ann)
    model = build_model({k: v for k, v in cfg["model"].items()
                         if k not in ("test_cfg",)},
                        test_cfg=cfg["model"]["test_cfg"])
    x = jnp.zeros((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    trainable, _ = partition_params(params)
    tx = build_optimizer(cfg["optimizer"], trainable, schedule=1e-2)
    state = create_train_state(params, tx)
    frozen_before = jax.device_get(state.frozen)

    step = jax.jit(make_train_step(model, tx))
    mesh = make_mesh()
    batch = {
        "imgs": np.random.default_rng(0).integers(
            0, 255, (8, 1, 4, 32, 32, 3), dtype=np.uint8).astype(np.float32),
        "label": np.arange(8) % 3,
    }
    # pre-prepared floats path: (B,V,T,H,W,C) -> model wants (B,V,C,T,H,W)
    batch["imgs"] = np.transpose(batch["imgs"], (0, 1, 5, 2, 3, 4))
    with mesh:
        sb = shard_batch(mesh, batch)
        state2, metrics = step(state, sb, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # trainable moved
    t_delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(state.trainable),
        jax.tree_util.tree_leaves(state2.trainable)))
    assert t_delta > 0
    # frozen untouched
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(jax.device_get(state2.frozen))):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip(tmp_path, ann):
    cfg = tiny_cfg(tmp_path, ann)
    model = build_model({k: v for k, v in cfg["model"].items()
                         if k != "test_cfg"}, test_cfg=cfg["model"]["test_cfg"])
    x = jnp.zeros((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    trainable, _ = partition_params(params)
    tx = build_optimizer(cfg["optimizer"], trainable, schedule=1e-2)
    state = create_train_state(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ck"), max_keep=2)
    mgr.save(state, epoch=1)
    mgr.save(state, epoch=2)
    mgr.save(state, epoch=3)
    assert mgr.latest_epoch() == 3
    restored, epoch = mgr.restore(state)
    assert epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.trainable),
                    jax.tree_util.tree_leaves(restored.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # max_keep pruned epoch 1
    import os
    assert not os.path.exists(os.path.join(str(tmp_path / "ck"), "ckpt_1"))
    # save_best
    assert mgr.save_best(state, 3, 0.5)
    assert not mgr.save_best(state, 4, 0.4)
    assert mgr.save_best(state, 5, 0.9)


def test_bn_model_trains_and_evals_end_to_end(tmp_path, ann):
    """BatchNorm collections must survive train -> checkpoint -> eval
    (ADVICE r1 high: batch_stats were dropped end-to-end, crashing every
    BN-based family)."""
    cfg = tiny_cfg(tmp_path, ann)
    cfg["model"] = dict(
        type="Recognizer3D",
        backbone=dict(type="ResNet3dSlowOnly", stage_blocks=(1, 1),
                      inflate=(0, 1), base_channels=16),
        cls_head=dict(type="I3DHead", num_classes=3, in_channels=128),
        test_cfg=dict(average_clips="prob"),
    )
    cfg["total_epochs"] = 1
    cfg["evaluation"] = dict(interval=1, save_best="top1_acc")
    state, history = train_model(cfg, validate=True, seed=0)
    assert np.isfinite(history[-1]["loss"])
    # batch_stats exist and were mutated by training
    stats = jax.tree_util.tree_leaves(state.model_state)
    assert stats, "BN model produced no model_state"
    assert any(float(jnp.abs(s).sum()) > 0 for s in stats)
    # eval consumes them (crashes with ScopeCollectionNotFound if dropped)
    res = run_evaluation(cfg, params=state.params, split="test",
                         model_state=state.model_state)
    assert "top1_acc" in res
    # variables-dict form works too
    res2 = run_evaluation(cfg, params=state.variables, split="test")
    assert res2["top1_acc"] == res["top1_acc"]
    # checkpoints round-trip the BN stats
    mgr = CheckpointManager(cfg["work_dir"])
    zeroed = state.replace(model_state=jax.tree_util.tree_map(
        jnp.zeros_like, state.model_state))
    restored, _ = mgr.restore(zeroed)
    for a, b in zip(jax.tree_util.tree_leaves(state.model_state),
                    jax.tree_util.tree_leaves(restored.model_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blending_shapes():
    from adapt_image_models_tpu.data.blending import mixup, cutmix, build_blending
    rng = jax.random.PRNGKey(0)
    imgs = jnp.ones((4, 3, 2, 8, 8))
    labels = jnp.array([0, 1, 2, 0])
    out, soft = mixup(rng, imgs, labels, 3, alpha=0.2)
    assert out.shape == imgs.shape and soft.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    out, soft = cutmix(rng, imgs, labels, 3, alpha=0.2)
    assert out.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    fn = build_blending(dict(type="LabelSmoothing", num_classes=3,
                             smoothing=0.1))
    _, soft = fn(rng, imgs, labels)
    np.testing.assert_allclose(np.asarray(soft[0]),
                               [1 - 0.1 + 0.1 / 3, 0.1 / 3, 0.1 / 3],
                               rtol=1e-5)


def test_frozen_prefix_anchoring_spares_head_modules():
    """Round-3 review regression: recognizer trees name the backbone
    'backbone_module', so the frozen_prefixes anchor must match on the
    prefix — a head conv1_* must stay trainable while backbone conv1
    freezes."""
    import jax.numpy as jnp
    from flax import traverse_util
    from adapt_image_models_tpu.parallel.partition import partition_params
    tree = {
        "backbone_module": {"conv1": {"kernel": jnp.ones((1,))},
                            "layer1_0": {"w": jnp.ones((1,))},
                            "layer2_0": {"w": jnp.ones((1,))}},
        "head_module": {"conv1_conv": {"kernel": jnp.ones((1,))}},
    }
    tr, fz = partition_params(tree, freeze_backbone=False,
                              frozen_prefixes=("conv1", "layer1_"))
    tk = {"/".join(k) for k in traverse_util.flatten_dict(tr)}
    fk = {"/".join(k) for k in traverse_util.flatten_dict(fz)}
    assert "head_module/conv1_conv/kernel" in tk
    assert "backbone_module/conv1/kernel" in fk
    assert "backbone_module/layer1_0/w" in fk
    assert "backbone_module/layer2_0/w" in tk


def test_fused_core_freeze_guard_fires():
    """Round-3 review regression: the attention_core='fused' guard must
    actually detect frozen-contract params in the trainable tree (the
    param key is 'backbone_module', not 'backbone')."""
    from flax import traverse_util
    # mirror of the guard predicate in apis/train.py
    frozen_only = ("mlp", "ln_2", "attn", "ln_1")
    trainable = {"backbone_module": {"transformer": {"resblocks": {
        "attn": {"in_proj_kernel": 0}}}}}
    bad = [k for k in traverse_util.flatten_dict(trainable)
           if any(part.startswith("backbone") for part in k)
           and any(p in frozen_only for p in k)]
    assert bad, "guard predicate no longer matches fused-frozen params"


def test_overfit_tiny_synthetic_set():
    """End-to-end LEARNING proof: the real train step (partitioned params,
    AdamW on the tunable tree, in-graph metrics) must memorize a tiny
    class-separable synthetic set — loss collapses and train top-1 hits
    1.0. This is the convergence check the reference only gets implicitly
    from its published accuracies (README.md); at unit scale it guards the
    whole optimizer/partition/loss/backward wiring at once."""
    model = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=32, patch_size=16,
                      width=32, layers=1, heads=2, num_frames=4,
                      drop_path_rate=0.0),
        cls_head=dict(type="I3DHead", num_classes=3, in_channels=32,
                      dropout_ratio=0.0),
    ), test_cfg=dict(average_clips="prob"))
    rng = np.random.default_rng(0)
    # 6 fixed clips, 3 classes: class k gets a strong mean shift in
    # channel k so the set is separable but still needs real learning
    imgs = rng.normal(0, 1, (6, 1, 3, 4, 32, 32)).astype(np.float32)
    labels = np.arange(6) % 3
    for i, lab in enumerate(labels):
        imgs[i, :, lab] += 2.0
    batch = {"imgs": jnp.asarray(imgs), "label": jnp.asarray(labels)}

    x = jnp.zeros((1, 3, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    trainable, _ = partition_params(params)
    tx = build_optimizer(dict(type="AdamW", lr=3e-2, weight_decay=0.0),
                         trainable, schedule=3e-2)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx))

    key = jax.random.PRNGKey(1)
    first_loss = None
    metrics = {}
    for _ in range(40):
        state, metrics = step(state, batch, key)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert np.isfinite(final_loss)
    assert final_loss < 0.25 * first_loss, (first_loss, final_loss)
    assert float(metrics["top1_acc"]) == 1.0, float(metrics["top1_acc"])


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path, ann):
    """TPU preemption safety: SIGTERM mid-training saves a checkpoint of
    the CURRENT epoch and returns cleanly; auto_resume replays it with the
    optimizer step count (LR schedule) intact."""
    import os
    import signal
    import threading

    cfg = tiny_cfg(tmp_path, ann)
    cfg["total_epochs"] = 50  # far more than the timer lets us run

    import time as _time
    stop = threading.Event()

    def _kill_when_armed():
        # wait until train_model has installed its handler, else the
        # default action would kill the test process
        for _ in range(600):
            if stop.is_set():
                return
            if signal.getsignal(signal.SIGTERM) not in (
                    signal.SIG_DFL, signal.default_int_handler, None):
                break
            _time.sleep(0.05)
        os.kill(os.getpid(), signal.SIGTERM)

    killer = threading.Thread(target=_kill_when_armed, daemon=True)
    killer.start()
    try:
        state, history = train_model(cfg, validate=False, seed=0)
    finally:
        stop.set()
    steps_done = int(jax.device_get(state.step))
    assert steps_done > 0, "no step completed before checkpointing"

    mgr = CheckpointManager(cfg["work_dir"])
    latest = mgr.latest_epoch()
    assert latest is not None and latest < 50, \
        "preemption checkpoint missing or training ran to completion"
    # the default handler is restored after train_model
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL,
                                                signal.default_int_handler)

    # resume: optimizer step count carried over, training continues
    cfg["total_epochs"] = latest + 1  # finish just the replayed epoch
    state2, _ = train_model(cfg, validate=False, seed=0, auto_resume=True)
    assert int(jax.device_get(state2.step)) > steps_done


def test_restore_variables_for_inference(tmp_path, ann):
    """CheckpointManager.restore_variables loads a checkpoint into a flax
    variables dict without a TrainState template (the demo/inference load
    path — mgr.restore(variables) used to crash on .trainable)."""
    cfg = tiny_cfg(tmp_path, ann)
    cfg["total_epochs"] = 1
    state, _ = train_model(cfg, validate=False, seed=0)

    mgr = CheckpointManager(cfg["work_dir"])
    variables = mgr.restore_variables()
    assert "params" in variables
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored dict drives a forward pass directly
    from adapt_image_models_tpu.models import build_model
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    model = build_model(model_cfg, test_cfg=test_cfg)
    x = jnp.zeros((1, 1, 3, 4, 32, 32))
    scores = model.apply({"params": variables["params"]}, x,
                         method=model.forward_test)
    assert scores.shape == (1, 3)
    np.testing.assert_allclose(float(jnp.sum(scores)), 1.0, rtol=1e-4)


def test_train_model_2d_recognizer_end_to_end(tmp_path, ann):
    """The 2D segment contract through the FULL recipe path: train_model
    init dummy, prepared-batch fold, in-loop eval and run_evaluation all
    speak (B, S, C, H, W) when the pipeline says FormatShape NCHW
    (reference TSN/TSM recipes; caught by a verify drive — no test
    exercised Recognizer2D through train_model before)."""
    pipe_train = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=4),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCHW"),
    ]
    pipe_test = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=4, test_mode=True),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCHW"),
    ]
    cfg = tiny_cfg(tmp_path, ann)
    cfg["model"] = dict(
        type="Recognizer2D",
        backbone=dict(type="ResNetTSM", depth=18, num_frames=4,
                      stage_blocks=(1, 1, 1, 1), base_channels=16),
        cls_head=dict(type="TSMHead", num_classes=3, in_channels=128,
                      num_segments=4, dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    )
    cfg["data"]["train"]["pipeline"] = pipe_train
    cfg["data"]["val"]["pipeline"] = pipe_test
    cfg["data"]["test"]["pipeline"] = pipe_test
    cfg["total_epochs"] = 1
    cfg["evaluation"] = dict(interval=1)
    state, history = train_model(cfg, validate=True, seed=0)
    assert np.isfinite(history[-1]["loss"])
    res = run_evaluation(cfg, params=state.params, split="test",
                         model_state=state.model_state)
    assert "top1_acc" in res
