"""Train state + jitted train/eval steps.

The reference's runner/hook machinery (``EpochBasedRunnerAmp``,
``DistOptimizerHook``, ``mmcv_custom/runner/epoch_based_runner.py:17``,
``mmaction/utils/optimizer.py:9``) collapses into: a pytree ``TrainState``
(trainable params, frozen params, optimizer state, step) and one jitted
``train_step`` containing forward, loss, backward (w.r.t. the trainable
sub-tree ONLY), optimizer update and in-graph top-1/top-5 metrics. Under a
data-sharded mesh, XLA emits the gradient all-reduce that DDP did by hand —
the ``_parse_losses`` all_reduce (``recognizers/base.py:239-242``) becomes
a by-product of computing the (replicated) mean loss over a sharded batch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from adapt_image_models_tpu.core.metrics import device_topk_accuracy
from adapt_image_models_tpu.models.losses.cross_entropy import (
    cross_entropy, soft_cross_entropy,
)
from adapt_image_models_tpu.parallel.partition import merge_params, partition_params


@struct.dataclass
class TrainState:
    step: jax.Array
    trainable: Any
    frozen: Any
    opt_state: Any
    # non-param variable collections (e.g. BatchNorm batch_stats for the
    # CNN backbone families); empty for the pure-ViT AIM models
    model_state: Any = struct.field(default_factory=dict)

    @property
    def params(self):
        return merge_params(self.trainable, self.frozen)

    @property
    def variables(self):
        return {"params": self.params, **self.model_state}


def split_variables(params_or_variables) -> Tuple[Any, Dict[str, Any]]:
    """Normalize to ``(params, model_state)``.

    Accepts either a bare param tree or a full flax variables dict (with a
    ``params`` key plus non-param collections such as ``batch_stats`` for the
    BN-based CNN families). Lets every eval/inference entry point take either
    form, so BatchNorm state is never silently dropped.
    """
    if isinstance(params_or_variables, dict) and "params" in params_or_variables:
        model_state = {k: v for k, v in params_or_variables.items()
                       if k != "params"}
        return params_or_variables["params"], model_state
    return params_or_variables, {}


def as_variables(params_or_variables) -> Dict[str, Any]:
    """Normalize bare params or a variables dict to a variables dict."""
    params, model_state = split_variables(params_or_variables)
    return {"params": params, **model_state}


def create_train_state(params, tx: optax.GradientTransformation,
                       model_state: Any = None,
                       frozen_prefixes=()) -> TrainState:
    trainable, frozen = partition_params(params,
                                         frozen_prefixes=frozen_prefixes)
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      frozen=frozen, opt_state=tx.init(trainable),
                      model_state=model_state or {})


def make_train_step(model, tx: optax.GradientTransformation,
                    prepare_fn: Optional[Callable] = None,
                    blending: Optional[Callable] = None) -> Callable:
    """Returns ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch``: {'imgs': (B, V, T, H, W, C) uint8 or pre-prepared floats,
    'label': (B,) int}. Train views are folded into the batch like the
    reference (``recognizer3d.py:16``).

    The loss comes from the head config's ``loss_cls`` when present
    (reference BaseHead semantics — e.g. the HVU recipes'
    ``BCELossWithLogits(loss_weight=333)``); otherwise hard/soft cross
    entropy by target shape.
    """
    custom_loss = None
    head_cfg = getattr(model, "cls_head", None)
    if isinstance(head_cfg, dict) and head_cfg.get("loss_cls"):
        from adapt_image_models_tpu.models.builder import build_loss
        custom_loss = build_loss(dict(head_cfg["loss_cls"]))

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng_step = jax.random.fold_in(rng, state.step)
        rng_drop, rng_blend = jax.random.split(rng_step)

        imgs = batch["imgs"]
        if prepare_fn is not None:
            imgs = prepare_fn(imgs)  # (B, V, C, T, H, W)
        if imgs.ndim == 6:
            imgs = imgs.reshape((-1,) + imgs.shape[2:])
        labels = batch["label"]

        if blending is not None:
            imgs, targets = blending(rng_blend, imgs, labels)
        else:
            targets = labels

        has_model_state = bool(jax.tree_util.tree_leaves(state.model_state))

        def loss_fn(trainable):
            # stop_gradient on the frozen tree: without it, AD still emits
            # (and scan accumulates) weight-gradient matmuls for every
            # frozen CLIP projection — pure waste, since only the adapter
            # partition is optimized. Cutting them at trace time drops the
            # backward's dW cost for the big matmuls entirely.
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                            state.frozen)
            params = merge_params(trainable, frozen)
            variables = {"params": params, **state.model_state}
            if has_model_state:
                logits, new_mstate = model.apply(
                    variables, imgs, deterministic=False,
                    rngs={"dropout": rng_drop},
                    mutable=list(state.model_state.keys()))
            else:
                logits = model.apply(variables, imgs, deterministic=False,
                                     rngs={"dropout": rng_drop})
                new_mstate = state.model_state
            if custom_loss is not None:
                loss = custom_loss(logits, targets)
            elif targets.ndim == logits.ndim:
                loss = soft_cross_entropy(logits, targets)
            else:
                loss = cross_entropy(logits, targets)
            return loss, (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)

        # multi-hot labels (multi_class heads): score top-k against the
        # strongest tag (the reference's BaseHead skips accuracy entirely)
        acc_labels = labels if labels.ndim == 1 else jnp.argmax(labels, -1)
        top1, top5 = device_topk_accuracy(logits, acc_labels, (1, 5))
        metrics = {
            "loss": loss,
            "top1_acc": top1,
            "top5_acc": top5,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = state.replace(step=state.step + 1,
                                  trainable=new_trainable,
                                  opt_state=new_opt,
                                  model_state=new_mstate)
        return new_state, metrics

    return train_step


def make_eval_step(model, prepare_fn: Optional[Callable] = None,
                   average_clips: str = "prob") -> Callable:
    """Returns ``eval_step(params, imgs) -> (B, C) scores`` with on-device
    multi-view aggregation (no host round-trips, unlike ``apis/test.py``'s
    pickled all_gather)."""
    from adapt_image_models_tpu.models.recognizers.recognizer3d import average_clip

    def eval_step(params, imgs):
        params, model_state = split_variables(params)
        if prepare_fn is not None:
            imgs = prepare_fn(imgs)
        num_views = imgs.shape[1] if imgs.ndim == 6 else 1
        logits = model.apply({"params": params, **model_state}, imgs,
                             deterministic=True)
        return average_clip(logits, num_views, average_clips)

    return eval_step
