"""Evaluation (reference ``mmaction/apis/test.py`` + ``tools/test.py``).

``run_evaluation`` streams the val/test split through the loader, computes
per-sample aggregated scores with a jitted multi-view eval step, and calls
``dataset.evaluate``. Multi-device: batches are sharded over the mesh's data
axis; resulting score arrays are already global (jit output is replicated) —
the reference's pickled-bytes ``all_gather`` with tmpdir fallback
(``apis/test.py:99-204``) disappears entirely.

``max_testing_views`` (reference ``recognizer3d.py:38-60``) chunks the view
axis to bound memory on long multi-view protocols (e.g. K700 32x3x3).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adapt_image_models_tpu.core.train_state import make_eval_step, split_variables
from adapt_image_models_tpu.data.datasets import build_dataset
from adapt_image_models_tpu.data.loader import VideoLoader
from adapt_image_models_tpu.data.pipeline import build_sample_processor
from adapt_image_models_tpu.data.transforms import (
    layout_from_pipeline, make_prepare_fn,
)
from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.models.recognizers.recognizer3d import average_clip
from adapt_image_models_tpu.parallel.mesh import make_mesh, shard_batch


def make_chunked_eval_step(model, prepare_fn, average_clips: str = "prob",
                           max_testing_views: Optional[int] = None,
                           shard_mesh=None, data_axis: str = "data",
                           segment_layout: bool = False):
    """Eval step that processes views in chunks of ``max_testing_views``.

    ``shard_mesh``: run the forward inside ``shard_map`` over ``data_axis``
    — required for Pallas-kernel models on a multi-device mesh (a bare
    pallas_call cannot be auto-partitioned by GSPMD).

    ``segment_layout``: the prepared batch is already the 2D recognizer's
    (B, S, C, H, W) contract — crops/clips/frames folded into consensus
    segments by the prepare fn (reference ``recognizer2d.py`` forward_test:
    num_segs = total rows / batch, consensus averages them all)."""
    if segment_layout and max_testing_views is not None:
        # the 2D consensus needs every segment in one apply; silently
        # dropping the chunking contract would unbound memory instead
        # (max_testing_views is a Recognizer3D-only test_cfg option in the
        # reference too, recognizer3d.py forward_test)
        raise ValueError("max_testing_views is not supported for 2D segment "
                         "recipes (FormatShape NCHW*): the consensus head "
                         "consumes all segments in one pass")

    def eval_step(variables, imgs_uint8):
        params, model_state = split_variables(variables)
        variables = {"params": params, **model_state}
        if shard_mesh is not None:
            from jax.sharding import PartitionSpec as PS
            inner = make_chunked_eval_step(model, prepare_fn, average_clips,
                                           max_testing_views,
                                           segment_layout=segment_layout)
            return jax.shard_map(
                inner, mesh=shard_mesh,
                in_specs=(PS(), PS(data_axis)), out_specs=PS(data_axis),
                check_vma=False,
            )(variables, imgs_uint8)
        if segment_layout:
            imgs = prepare_fn(imgs_uint8)  # (B, S, C, H, W), model-ready
            logits = model.apply(variables, imgs, deterministic=True)
            return average_clip(logits, 1, average_clips)
        imgs = prepare_fn(imgs_uint8)  # (B, V, C, T, H, W)
        b, v = imgs.shape[:2]
        if max_testing_views is None or v <= max_testing_views:
            flat = imgs.reshape((b * v,) + imgs.shape[2:])
            logits = model.apply(variables, flat, deterministic=True)
        else:
            if v % max_testing_views:
                raise ValueError(f"num views {v} not divisible by "
                                 f"max_testing_views {max_testing_views}")
            chunks = v // max_testing_views
            per = imgs.reshape((b, chunks, max_testing_views) + imgs.shape[2:])

            def one_chunk(c):
                flat = c.reshape((b * max_testing_views,) + c.shape[2:])
                out = model.apply(variables, flat, deterministic=True)
                return out.reshape(b, max_testing_views, -1)

            logits = jax.lax.map(one_chunk, per.transpose(1, 0, 2, 3, 4, 5, 6))
            logits = logits.transpose(1, 0, 2, 3).reshape(b * v, -1)
        return average_clip(logits, v, average_clips)

    return eval_step


def run_evaluation(cfg: Dict[str, Any], model=None, params=None,
                   split: str = "test", mesh=None,
                   metrics=("top_k_accuracy", "mean_class_accuracy"),
                   batch_size: Optional[int] = None,
                   num_workers: Optional[int] = None,
                   return_scores: bool = False,
                   model_state: Optional[Dict[str, Any]] = None):
    """Evaluate ``params`` (or a freshly built model) on cfg.data[split].

    ``params`` may be a bare param tree or a full variables dict; non-param
    collections (BatchNorm stats) can also be passed via ``model_state``.
    """
    params, state_from_params = split_variables(params)
    model_state = model_state or state_from_params or {}
    if model is None:
        model_cfg = dict(cfg["model"])
        test_cfg = model_cfg.pop("test_cfg", None)
        model_cfg.pop("train_cfg", None)
        model = build_model(model_cfg, test_cfg=test_cfg)
    test_cfg = (cfg["model"].get("test_cfg") or {})

    data_cfg = cfg["data"]
    ds_cfg = dict(data_cfg[split])
    pipeline = ds_cfg.pop("pipeline")
    dataset = build_dataset({**ds_cfg, "pipeline": pipeline})

    dl_cfg = data_cfg.get(f"{split}_dataloader", {}) or {}
    batch_size = batch_size or int(dl_cfg.get("videos_per_gpu", 1))
    num_workers = num_workers or int(dl_cfg.get("workers_per_gpu", 4))

    proc = build_sample_processor(pipeline)
    mean, std = proc.mean, proc.std
    compute_dtype = cfg["model"].get("backbone", {}).get(
        "compute_dtype", jnp.float32)
    prepare = make_prepare_fn(mean, std, dtype=compute_dtype,
                              layout=layout_from_pipeline(pipeline))

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    eval_bs = batch_size * n_dev

    loader = VideoLoader(dataset, proc, batch_size=eval_bs, shuffle=False,
                         num_workers=num_workers, drop_last=False)

    backbone_cfg = dict(cfg["model"]).get("backbone", {})
    is_fused = backbone_cfg.get("attention_core") == "fused"
    use_shard_map = (is_fused and mesh.devices.size > 1
                     and mesh.devices.shape[1] == 1)
    if is_fused and mesh.devices.size > 1 and not use_shard_map:
        # bare pallas_call cannot be GSPMD-partitioned; the train path
        # raises for this layout and eval must not silently fall through
        raise ValueError(
            "fused-kernel models evaluate via shard_map, which needs a "
            f"data-only mesh; got model axis {mesh.devices.shape[1]} > 1. "
            "Use attention_core='xla' for tensor-parallel eval.")
    eval_step = jax.jit(make_chunked_eval_step(
        model, prepare, test_cfg.get("average_clips", "prob"),
        test_cfg.get("max_testing_views"),
        shard_mesh=mesh if use_shard_map else None,
        segment_layout=layout_from_pipeline(pipeline) in (
            "NCHW", "NCHW_Flow")))

    scores = []
    n = len(dataset)
    with mesh:
        for batch in loader:
            imgs = batch["imgs"]
            pad = 0
            if imgs.shape[0] % n_dev:
                pad = n_dev - imgs.shape[0] % n_dev
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            device_imgs = shard_batch(mesh, imgs)
            s = np.asarray(jax.device_get(
                eval_step({"params": params, **model_state}, device_imgs)))
            if pad:
                s = s[:-pad]
            scores.append(s)
    scores = np.concatenate(scores)[:n]
    results = dataset.evaluate(scores, metrics=metrics)
    if return_scores:
        return results, scores, dataset.labels()
    return results


def run_exported_evaluation(cfg: Dict[str, Any], artifact_path: str,
                            split: str = "test",
                            metrics=("top_k_accuracy",
                                     "mean_class_accuracy"),
                            num_workers: int = 4,
                            return_scores: bool = False):
    """Evaluate straight through a serialized StableHLO artifact — the
    analog of the reference's ONNX-Runtime / TensorRT inference paths in
    ``tools/test.py:172,222``: no flax model or checkpoint needed, only the
    artifact produced by ``tools/deployment/export.py`` (which closes over
    the weights).

    The artifact maps normalized ``(b, 3, T, H, W)`` float input to logits;
    view folding, normalization and clip averaging happen here on host.
    """
    from jax import export as jexport
    with open(artifact_path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    art_bs = exported.in_avals[0].shape[0]

    data_cfg = cfg["data"]
    ds_cfg = dict(data_cfg[split])
    pipeline = ds_cfg.pop("pipeline")
    dataset = build_dataset({**ds_cfg, "pipeline": pipeline})
    proc = build_sample_processor(pipeline)
    mean = np.asarray(proc.mean, np.float32)
    std = np.asarray(proc.std, np.float32)
    avg_mode = (cfg["model"].get("test_cfg") or {}).get("average_clips",
                                                        "prob")

    loader = VideoLoader(dataset, proc, batch_size=1, shuffle=False,
                         num_workers=num_workers, drop_last=False)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    scores = []
    for batch in loader:
        imgs = batch["imgs"][0]  # (V, T, H, W, C) uint8 from the loader
        v = imgs.shape[0]
        x = imgs.astype(np.float32)
        x = (x - mean) / std
        x = x.transpose(0, 4, 1, 2, 3)  # -> (V, C, T, H, W)
        logits = []
        for i in range(0, v, art_bs):
            chunk = x[i:i + art_bs]
            pad = art_bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, 0)])
            out = np.asarray(exported.call(chunk))
            logits.append(out[:art_bs - pad] if pad else out)
        logits = np.concatenate(logits)  # (V, num_classes)
        if avg_mode == "prob":
            score = softmax(logits).mean(0)
        elif avg_mode == "score":
            score = logits.mean(0)
        else:
            score = logits[0]
        scores.append(score)
    scores = np.stack(scores)
    results = dataset.evaluate(scores, metrics=metrics)
    if return_scores:
        return results, scores, dataset.labels()
    return results
