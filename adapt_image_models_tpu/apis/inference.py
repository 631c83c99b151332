"""Single-video inference (reference ``mmaction/apis/inference.py:16-109``).

``init_recognizer(cfg, checkpoint)`` -> (model, params);
``inference_recognizer(model, params, cfg, video)`` -> top-k (label, score)
pairs, optionally returning intermediate backbone features (the reference's
``OutputHook`` capability, ``mmaction/core/hooks/output.py:7``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adapt_image_models_tpu.data.pipeline import build_sample_processor
from adapt_image_models_tpu.data.transforms import (
    init_sample_shape, layout_from_pipeline, make_prepare_fn,
)
from adapt_image_models_tpu.models import build_model


def init_recognizer(cfg: Dict[str, Any], checkpoint: Optional[str] = None,
                    seed: int = 0):
    """Build model + params, optionally loading a converted AIM checkpoint."""
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, test_cfg=test_cfg)

    pipeline = cfg["data"]["test"]["pipeline"]
    proc = build_sample_processor(pipeline)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros(init_sample_shape(pipeline, proc),
                                     jnp.float32))
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    if checkpoint:
        import torch
        from adapt_image_models_tpu.convert.aim_import import (
            load_aim_checkpoint_into_params,
        )
        ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
        params = load_aim_checkpoint_into_params(params, ckpt, strict=False)
    if model_state:  # BN families: hand back the full variables dict
        return model, {"params": params, **model_state}
    return model, params


def inference_recognizer(model, params, cfg: Dict[str, Any], video: str,
                         topk: int = 5,
                         return_features: bool = False):
    """Run the test pipeline on one video and return top-k (class, score)."""
    pipeline = cfg["data"]["test"]["pipeline"]
    proc = build_sample_processor(pipeline)
    clips, _ = proc(video, label=0)
    imgs = clips[None]  # (1, V, T, H, W, C)

    layout = layout_from_pipeline(pipeline)
    prepare = make_prepare_fn(proc.mean, proc.std, layout=layout)
    views = prepare(jnp.asarray(imgs))

    test_cfg = cfg["model"].get("test_cfg") or {}
    from adapt_image_models_tpu.core.train_state import split_variables
    from adapt_image_models_tpu.models.recognizers.recognizer3d import average_clip
    params, model_state = split_variables(params)
    variables = {"params": params, **model_state}
    if layout in ("NCHW", "NCHW_Flow"):
        # already the 2D segment contract (B, S, C, H, W); consensus inside
        # the head does the averaging
        v, flat = 1, views
    else:
        b, v = views.shape[:2]
        flat = views.reshape((b * v,) + views.shape[2:])
    if return_features:
        feats = model.apply(variables, flat, deterministic=True,
                            method=model.extract_feat)
    logits = model.apply(variables, flat, deterministic=True)
    scores = average_clip(logits, v, test_cfg.get("average_clips", "prob"))
    scores = np.asarray(scores)[0]
    order = np.argsort(scores)[::-1][:topk]
    results: List[Tuple[int, float]] = [(int(i), float(scores[i])) for i in order]
    if return_features:
        return results, np.asarray(feats)
    return results
