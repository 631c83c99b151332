"""AVA detection training + evaluation orchestration.

Reference flow: mmdet-style detector driven by the same ``train_model`` /
``multi_gpu_test`` machinery (AVA configs under
``/root/reference/configs/detection/ava/``). Here detectors get their own
jitted step (multilabel focal-BCE over fixed-shape RoIs) and an evaluation
loop that feeds ``AVADataset.evaluate``'s frame-mAP.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adapt_image_models_tpu.core.checkpoint import CheckpointManager
from adapt_image_models_tpu.core.optim import build_optimizer
from adapt_image_models_tpu.core.schedule import build_schedule
from adapt_image_models_tpu.core.train_state import (
    TrainState, create_train_state, split_variables,
)
from adapt_image_models_tpu.data.datasets import build_dataset
from adapt_image_models_tpu.data.loader import VideoLoader
from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.parallel.mesh import make_hybrid_mesh, shard_batch
from adapt_image_models_tpu.parallel.partition import merge_params, partition_params
from adapt_image_models_tpu.utils.logger import get_root_logger


def make_det_prepare_fn(mean, std, dtype=jnp.float32):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def prepare(imgs):  # (B, T, H, W, C) uint8 -> (B, C, T, H, W)
        x = (imgs.astype(jnp.float32) - mean) / std
        return x.transpose(0, 4, 1, 2, 3).astype(dtype)

    return prepare


def make_detection_train_step(model, tx, prepare_fn):
    def train_step(state: TrainState, batch, rng):
        rng_step = jax.random.fold_in(rng, state.step)
        imgs = prepare_fn(batch["imgs"])
        lt_feat = batch.get("lt_feat")  # FBO models: sampled LFB window

        has_mstate = bool(jax.tree_util.tree_leaves(state.model_state))

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            variables = {"params": params, **state.model_state}
            if has_mstate:
                scores, new_mstate = model.apply(
                    variables, imgs, batch["rois"], lt_feat=lt_feat,
                    deterministic=False, rngs={"dropout": rng_step},
                    mutable=list(state.model_state.keys()))
            else:
                scores = model.apply(variables, imgs, batch["rois"],
                                     lt_feat=lt_feat, deterministic=False,
                                     rngs={"dropout": rng_step})
                new_mstate = state.model_state
            loss, metrics = model.apply(
                {"params": params}, scores, batch["labels"],
                batch["roi_weights"], method=model.loss)
            return loss, (metrics, new_mstate)

        (loss, (metrics, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, trainable=new_trainable,
                             opt_state=new_opt,
                             model_state=new_mstate), metrics

    return train_step


def _maybe_build_lfb(model_cfg: Dict[str, Any]):
    """Build the host-side long-term feature bank when the model carries an
    FBOHead shared head (reference lfb configs); returns (LFB or None,
    window length L = window_size * max_num_sampled_feat)."""
    shared = (model_cfg.get("roi_head") or {}).get("shared_head") or {}
    if shared.get("type") != "FBOHead" or "lfb_cfg" not in shared:
        return None, 0
    from adapt_image_models_tpu.models.lfb import LFB
    lfb_cfg = dict(shared["lfb_cfg"])
    lfb = LFB(**lfb_cfg)
    window = (int(lfb_cfg.get("window_size", 60))
              * int(lfb_cfg.get("max_num_sampled_feat", 5)))
    return lfb, window


def _sample_lt_feat(lfb, img_keys) -> np.ndarray:
    """(B, L, C) bank windows for a batch of 'video_id,timestamp' keys."""
    rows = []
    for k in img_keys:
        video_id, ts = k.rsplit(",", 1)
        rows.append(lfb.sample_long_term_features(video_id, int(ts)))
    return np.stack(rows)


def train_detector(cfg: Dict[str, Any], work_dir: Optional[str] = None,
                   validate: bool = False, seed: int = 0,
                   auto_resume: bool = False,
                   max_steps: Optional[int] = None, mesh=None):
    """Detection analog of ``apis.train.train_model`` (same cfg layout)."""
    logger = get_root_logger()
    work_dir = work_dir or cfg.get("work_dir", "./work_dir")

    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    train_cfg = model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, train_cfg=train_cfg, test_cfg=test_cfg)

    data_cfg = cfg["data"]
    ds_cfg = dict(data_cfg["train"])
    dataset = build_dataset(ds_cfg)

    if mesh is None:
        mesh = make_hybrid_mesh()
    n_data = mesh.devices.shape[0]
    batch = int(data_cfg.get("videos_per_gpu", 2)) * n_data
    loader = VideoLoader(dataset, dataset.pipeline, batch_size=batch,
                         shuffle=True, seed=seed,
                         num_workers=int(data_cfg.get("workers_per_gpu", 2)),
                         drop_last=True)

    prepare = make_det_prepare_fn(dataset.mean, dataset.std)

    lfb, lfb_window = _maybe_build_lfb(model_cfg)

    sample = next(iter(loader))
    imgs0 = prepare(jnp.asarray(sample["imgs"][:1]))
    rois0 = jnp.asarray(sample["rois"][:1])
    lt0 = (jnp.zeros((1, lfb_window, lfb.lfb_channels))
           if lfb is not None else None)
    variables = model.init(jax.random.PRNGKey(seed), imgs0, rois0,
                           lt_feat=lt0)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    steps_per_epoch = max(1, len(loader))
    total_epochs = int(cfg.get("total_epochs", 1))
    schedule = build_schedule(cfg.get("lr_config", {}) or {},
                              cfg["optimizer"]["lr"], total_epochs,
                              steps_per_epoch)
    trainable, _ = partition_params(params)
    grad_clip = (cfg.get("optimizer_config") or {}).get("grad_clip")
    if isinstance(grad_clip, dict):
        grad_clip = grad_clip.get("max_norm")
    tx = build_optimizer(cfg["optimizer"], trainable, schedule,
                         grad_clip=grad_clip)
    state = create_train_state(params, tx, model_state=model_state)

    train_step = jax.jit(make_detection_train_step(model, tx, prepare),
                         donate_argnums=(0,))
    ckpt_mgr = CheckpointManager(
        work_dir, max_keep=(cfg.get("checkpoint_config") or {}).get(
            "max_keep_ckpts"))

    start_epoch = 0
    if auto_resume and ckpt_mgr.latest_epoch() is not None:
        state, start_epoch = ckpt_mgr.restore(state)
        logger.info(f"auto-resumed detector from epoch {start_epoch}")

    # preemption safety, same contract as apis.train.train_model: SIGTERM
    # checkpoints the current epoch at the next step boundary, exits clean
    from adapt_image_models_tpu.apis.train import preemption_guard

    base_rng = jax.random.PRNGKey(seed + 1)
    history = []
    global_step = 0
    log_interval = int((cfg.get("log_config") or {}).get("interval", 20))
    with preemption_guard(logger) as preempted, mesh:
            for epoch in range(start_epoch, total_epochs):
                loader.set_epoch(epoch)
                for i, batch_data in enumerate(loader):
                    if lfb is not None:
                        batch_data["lt_feat"] = _sample_lt_feat(
                            lfb, batch_data["img_key"])
                    device_batch = shard_batch(mesh, {
                        k: v for k, v in batch_data.items()
                        if not isinstance(v, list)})
                    state, metrics = train_step(state, device_batch,
                                                base_rng)
                    global_step += 1
                    if preempted.is_set():
                        ckpt_mgr.save(state, epoch)  # resume replays epoch
                        logger.info(
                            f"preempted at epoch {epoch + 1} iter {i + 1}: "
                            "checkpoint saved, exiting cleanly")
                        return state, history
                    if (i + 1) % log_interval == 0 or i + 1 == len(loader):
                        m = {k: float(v) for k, v in
                             jax.device_get(metrics).items()}
                        logger.info(
                            f"Epoch [{epoch + 1}][{i + 1}/{len(loader)}] "
                            f"loss: {m['loss']:.4f} "
                            f"recall@thr=0.5: {m['recall@thr=0.5']:.3f}")
                        history.append({"epoch": epoch, "iter": i + 1, **m})
                    if max_steps and global_step >= max_steps:
                        break
                ckpt_mgr.save(state, epoch + 1)
                if max_steps and global_step >= max_steps:
                    break
    if validate:
        results = run_detection_evaluation(cfg, model, state.variables,
                                           split="val", mesh=mesh)
        logger.info(f"val: {results}")
    return state, history


def run_detection_evaluation(cfg: Dict[str, Any], model=None, params=None,
                             split: str = "val", mesh=None,
                             batch_size: Optional[int] = None):
    """Stream the split through the detector and compute frame mAP."""
    if model is None:
        model_cfg = dict(cfg["model"])
        test_cfg = model_cfg.pop("test_cfg", None)
        model_cfg.pop("train_cfg", None)
        model = build_model(model_cfg, test_cfg=test_cfg)
    params, model_state = split_variables(params)
    variables = {"params": params, **model_state}

    dataset = build_dataset(dict(cfg["data"][split]))
    if mesh is None:
        mesh = make_hybrid_mesh()
    n_dev = mesh.devices.size
    dl_cfg = cfg["data"].get(f"{split}_dataloader", {}) or {}
    bs = (batch_size
          or int(dl_cfg.get("videos_per_gpu",
                            cfg["data"].get("videos_per_gpu", 1)))) * n_dev
    loader = VideoLoader(dataset, dataset.pipeline, batch_size=bs,
                         shuffle=False, num_workers=2, drop_last=False)
    prepare = make_det_prepare_fn(dataset.mean, dataset.std)

    lfb, _ = _maybe_build_lfb(dict(cfg["model"]))

    @jax.jit
    def eval_step(imgs, rois, lt_feat=None):
        scores = model.apply(variables, prepare(imgs), rois,
                             lt_feat=lt_feat, deterministic=True)
        return jax.nn.sigmoid(scores)

    results = []
    with mesh:
        for batch in loader:
            n = batch["imgs"].shape[0]
            pad = (-n) % n_dev
            imgs = batch["imgs"]
            rois = batch["rois"]
            lt = (_sample_lt_feat(lfb, batch["img_key"])
                  if lfb is not None else None)
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
                rois = np.concatenate([rois, np.repeat(rois[-1:], pad, 0)])
                if lt is not None:
                    lt = np.concatenate([lt, np.repeat(lt[-1:], pad, 0)])
            scores = np.asarray(jax.device_get(eval_step(
                shard_batch(mesh, imgs), shard_batch(mesh, rois),
                None if lt is None else shard_batch(mesh, lt))))
            if pad:
                scores = scores[:n]
            for i in range(n):
                results.append({
                    "img_key": batch["img_key"][i],
                    "boxes": batch["rois"][i],
                    "scores": scores[i],
                    "mask": batch["roi_weights"][i],
                    "img_shape": batch["img_shape"][i],
                })
    return dataset.evaluate(results)
