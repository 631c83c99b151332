"""Training orchestration (reference ``mmaction/apis/train.py:20-199``).

``train_model(cfg)`` drives the whole recipe from an mmcv-layout config:
model / data / optimizer / lr_config / total_epochs / checkpointing /
periodic evaluation — with the runner+hooks machinery replaced by a plain
loop around one jitted train step.

TPU mapping of the reference stack:
* apex AMP O1 (`:87-99`)          -> bf16 compute dtype in the model
* MMDistributedDataParallel       -> data-sharded mesh; XLA emits the psums
* DistSamplerSeedHook             -> loader.set_epoch(seeded shuffling)
* DistOptimizerHook.update_interval -> optax.MultiSteps (+ the reference
  divides per-GPU batch by update_interval, ``apis/train.py:53`` — same here)
* EvalHook/DistEvalHook           -> periodic run_evaluation + save_best
* CheckpointHook + auto_resume    -> CheckpointManager epoch saves + latest
"""

from __future__ import annotations

import contextlib
import signal
import threading
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adapt_image_models_tpu.core.checkpoint import CheckpointManager
from adapt_image_models_tpu.core.optim import build_optimizer
from adapt_image_models_tpu.core.schedule import build_schedule
from adapt_image_models_tpu.core.train_state import (
    create_train_state, make_train_step, make_eval_step,
)
from adapt_image_models_tpu.data.blending import build_blending
from adapt_image_models_tpu.data.datasets import build_dataset
from adapt_image_models_tpu.data.loader import VideoLoader
from adapt_image_models_tpu.data.pipeline import build_sample_processor
from adapt_image_models_tpu.data.transforms import (
    init_sample_shape, layout_from_pipeline, make_prepare_fn,
)
from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.parallel.mesh import (
    make_hybrid_mesh, shard_batch,
)
from adapt_image_models_tpu.utils.logger import get_root_logger


def _norm_cfg_from_pipeline(pipeline):
    for item in pipeline:
        if item.get("type") == "Normalize":
            return item.get("mean"), item.get("std")
    return None, None


def train_model(cfg: Dict[str, Any], work_dir: Optional[str] = None,
                validate: bool = True, seed: int = 0,
                auto_resume: bool = False, max_steps: Optional[int] = None,
                mesh=None):
    """Run the full training recipe described by ``cfg`` (mmcv layout)."""
    from adapt_image_models_tpu.models.builder import DETECTORS
    if cfg["model"].get("type") in DETECTORS:
        from adapt_image_models_tpu.apis.detection import train_detector
        return train_detector(cfg, work_dir=work_dir, validate=validate,
                              seed=seed, auto_resume=auto_resume,
                              max_steps=max_steps, mesh=mesh)

    logger = get_root_logger()
    work_dir = work_dir or cfg.get("work_dir", "./work_dir")

    # ---- model -----------------------------------------------------------
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    train_cfg = model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, train_cfg=train_cfg, test_cfg=test_cfg)

    data_cfg = cfg["data"]
    omni_cfgs = None
    if isinstance(data_cfg["train"], (list, tuple)):
        # OmniSource-style multi-dataset training: first entry is the main
        # source, the rest cycle between its batches
        omni_cfgs = [dict(c) for c in data_cfg["train"]]
        train_ds_cfg = omni_cfgs[0]
    else:
        train_ds_cfg = dict(data_cfg["train"])
    train_pipeline = train_ds_cfg.pop("pipeline")
    train_ds = build_dataset({**train_ds_cfg, "pipeline": train_pipeline})

    if mesh is None:
        # multi-slice pods get the DCN-aware layout (data across slices,
        # any model axis inside one); single-slice/CPU is a plain dp mesh
        mesh = make_hybrid_mesh()
    n_data = mesh.devices.shape[0]

    # grad accumulation divides the loader batch (reference apis/train.py:53);
    # videos_per_gpu is per-device (DDP semantics), so the global micro-batch
    # scales by the data axis
    update_interval = int(cfg.get("optimizer_config", {}).get("update_interval", 1))
    videos_per_dev = int(data_cfg.get("videos_per_gpu", 8))
    if videos_per_dev % update_interval:
        raise ValueError("videos_per_gpu must be divisible by update_interval")
    micro_batch = (videos_per_dev // update_interval) * n_data

    num_hosts = jax.process_count()
    host_id = jax.process_index()
    if micro_batch % num_hosts:
        raise ValueError(f"global micro-batch {micro_batch} not divisible by "
                         f"{num_hosts} hosts")
    def _make_loader(ds, pipeline, batch_size=None):
        return VideoLoader(
            ds, pipeline, batch_size=batch_size or micro_batch // num_hosts,
            shuffle=True, seed=seed,
            num_workers=int(data_cfg.get("workers_per_gpu", 4)),
            drop_last=True, num_shards=num_hosts, shard_index=host_id)

    loader = _make_loader(train_ds, train_pipeline)
    if omni_cfgs:
        from adapt_image_models_tpu.data.loader import RoundRobinLoader
        # per-source batch sizes (reference ``data.omni_videos_per_gpu``,
        # e.g. [12, 64, 12, 12] — web images batch larger than clips)
        omni_vpg = data_cfg.get("omni_videos_per_gpu")
        aux_loaders = []
        for i, aux_cfg in enumerate(omni_cfgs[1:], start=1):
            aux_cfg = dict(aux_cfg)
            aux_pipe = aux_cfg.pop("pipeline")
            aux_ds = build_dataset({**aux_cfg, "pipeline": aux_pipe})
            aux_bs = None
            if omni_vpg:
                vpg = int(omni_vpg[i])
                # same divisibility contract as the main loader — a silent
                # floor would drop the recipe's per-source batch ratio
                if vpg % update_interval:
                    raise ValueError(
                        f"omni_videos_per_gpu[{i}]={vpg} must be divisible "
                        f"by update_interval={update_interval}")
                if (vpg // update_interval) * n_data % num_hosts:
                    raise ValueError(
                        f"omni source {i} global micro-batch "
                        f"{(vpg // update_interval) * n_data} not divisible "
                        f"by {num_hosts} hosts")
                aux_bs = (vpg // update_interval) * n_data // num_hosts
            aux_loaders.append(_make_loader(aux_ds, aux_pipe,
                                            batch_size=aux_bs))
        loader = RoundRobinLoader([loader] + aux_loaders,
                                  ratios=data_cfg.get("train_ratio"))

    mean, std = _norm_cfg_from_pipeline(train_pipeline)
    compute_dtype = model_cfg.get("backbone", {}).get("compute_dtype", jnp.float32)
    layout = layout_from_pipeline(train_pipeline)
    prepare = make_prepare_fn(mean or (122.769, 116.74, 104.04),
                              std or (68.493, 66.63, 70.321),
                              dtype=compute_dtype, layout=layout)

    # ---- init / pretrained ----------------------------------------------
    proc = build_sample_processor(train_pipeline)
    sample = jnp.zeros(init_sample_shape(train_pipeline, proc), jnp.float32)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, sample)
    params = variables["params"]
    # non-param collections (BatchNorm batch_stats for the CNN families) must
    # survive end-to-end: train step mutates them, eval consumes them,
    # checkpoints persist them
    model_state = {k: v for k, v in variables.items() if k != "params"}

    pretrained = cfg.get("load_from")
    if pretrained:
        from adapt_image_models_tpu.convert.aim_import import (
            load_aim_checkpoint_into_params,
        )
        import torch
        logger.info(f"loading checkpoint {pretrained}")
        ckpt = torch.load(pretrained, map_location="cpu", weights_only=False)
        params = load_aim_checkpoint_into_params(params, ckpt, strict=False)
    clip_pretrained = cfg.get("clip_pretrained")
    if clip_pretrained:
        from adapt_image_models_tpu.convert.clip_import import load_clip_into_params
        import torch
        logger.info(f"loading CLIP weights {clip_pretrained}")
        sd = torch.load(clip_pretrained, map_location="cpu", weights_only=False)
        layers = model_cfg["backbone"].get("layers", 12)
        params = load_clip_into_params(params, sd, layers)

    # ---- optimizer / schedule -------------------------------------------
    steps_per_epoch = max(1, len(loader) // update_interval)
    total_epochs = int(cfg.get("total_epochs", 1))
    schedule = build_schedule(cfg.get("lr_config", {}), cfg["optimizer"]["lr"],
                              total_epochs, steps_per_epoch)
    grad_clip = (cfg.get("optimizer_config") or {}).get("grad_clip")
    if isinstance(grad_clip, dict):
        grad_clip = grad_clip.get("max_norm")
    from adapt_image_models_tpu.parallel.partition import partition_params
    # CNN frozen_stages: partition the frozen stem/stages OUT of the
    # trainable tree (stop_gradient alone still lets the optimizer's
    # weight decay drift them — reference requires_grad=False semantics)
    fs = int(model_cfg.get("backbone", {}).get("frozen_stages", -1))
    frozen_prefixes = ()
    if fs >= 0:
        frozen_prefixes = ("conv1", "bn1") + tuple(
            f"layer{i + 1}_" for i in range(fs))
    if model_cfg.get("backbone", {}).get("bn_frozen"):
        # reference bn_frozen (ircsn bnfrozen recipes): BN affine params
        # get requires_grad=False; here they move to the frozen partition.
        # Prefix match is anchored to the backbone subtree, where any path
        # segment may match — bn1/bn2/bn3, downsample/lateral BNs.
        frozen_prefixes = frozen_prefixes + ("bn", "downsample_bn",
                                             "lateral_bn")
    trainable, _ = partition_params(params, frozen_prefixes=frozen_prefixes)
    # the fused train path returns ZERO cotangents for the frozen CLIP
    # weights: joint kernel -> mlp/ln_2 (fused_joint_train_block), dX-only
    # attention backwards -> attn/ln_1 (fused_*_block_frozen). Only valid
    # when those weights are frozen (the AIM regime, reference
    # vitclip_aim.py:424-427).
    if model_cfg.get("backbone", {}).get("attention_core") == "fused":
        from flax import traverse_util
        frozen_only = ("mlp", "ln_2", "attn", "ln_1")
        bad = [k for k in traverse_util.flatten_dict(trainable)
               if any(part.startswith("backbone") for part in k)
               and any(p in frozen_only for p in k)]
        if bad:
            raise ValueError(
                "attention_core='fused' trains with kernel backwards that "
                "assume frozen CLIP attention/MLP/LN weights, but these "
                "params are trainable: "
                f"{['/'.join(map(str, k)) for k in bad[:4]]}. "
                "Use attention_core='xla' for full fine-tuning.")
    tx = build_optimizer(cfg["optimizer"], trainable, schedule,
                         grad_clip=grad_clip, update_interval=update_interval)

    state = create_train_state(params, tx, model_state=model_state,
                               frozen_prefixes=frozen_prefixes)
    del params, variables, model_state

    blending = None
    if train_cfg and train_cfg.get("blending"):
        blending = build_blending(train_cfg["blending"])

    # ---- jit ---------------------------------------------------------------
    # kernel models on a multi-device mesh need the explicit shard_map DP
    # path: a bare pallas_call cannot be auto-partitioned by GSPMD (see
    # core/train_state.make_train_step). Params stay replicated under it,
    # so the (optional) TP model axis must be 1.
    use_shard_map = (model_cfg.get("backbone", {}).get("attention_core")
                     == "fused" and mesh.devices.size > 1)
    if use_shard_map and mesh.devices.shape[1] != 1:
        raise ValueError(
            "attention_core='fused' trains data-parallel only (Pallas "
            "kernels run per-shard under shard_map with replicated "
            "params); use attention_core='xla' for a model-parallel mesh")
    train_step = make_train_step(model, tx, prepare_fn=prepare,
                                 blending=blending,
                                 shard_mesh=mesh if use_shard_map else None)
    train_step = jax.jit(train_step, donate_argnums=(0,))

    ckpt_mgr = CheckpointManager(
        work_dir, max_keep=(cfg.get("checkpoint_config") or {}).get("max_keep_ckpts"))
    start_epoch = 0
    if auto_resume and ckpt_mgr.latest_epoch() is not None:
        state, start_epoch = ckpt_mgr.restore(state)
        logger.info(f"auto-resumed from epoch {start_epoch}")

    eval_cfg = cfg.get("evaluation", {}) or {}
    eval_interval = int(eval_cfg.get("interval", 0)) if validate else 0
    ckpt_interval = int((cfg.get("checkpoint_config") or {}).get("interval", 1))
    log_interval = int((cfg.get("log_config") or {}).get("interval", 20))

    base_rng = jax.random.PRNGKey(seed + 1)
    global_step = 0
    history = []
    with preemption_guard(logger) as preempted:
        return _train_loop(cfg, state, train_step, loader, mesh, ckpt_mgr,
                           logger, schedule, update_interval, start_epoch,
                           total_epochs, eval_interval, eval_cfg,
                           ckpt_interval, log_interval, base_rng,
                           global_step, history, max_steps, model,
                           validate, preempted)


@contextlib.contextmanager
def preemption_guard(logger):
    """Preemption safety (TPU fleets send SIGTERM before reclaiming a VM):
    yields a flag Event the SIGTERM handler sets; the train loops
    checkpoint the CURRENT epoch at the next step boundary and return
    cleanly, so `auto_resume` replays the partial epoch with the optimizer
    step count (and thus the LR schedule) intact. Signal handlers only
    install on the main thread — nested/threaded callers just skip the
    feature. Shared by train_model and train_detector."""
    preempted = threading.Event()
    prev_handler = None
    if threading.current_thread() is threading.main_thread():
        def _on_sigterm(signum, frame):
            logger.warning("SIGTERM received — checkpointing for a "
                           "preemption-safe exit")
            preempted.set()
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    try:
        yield preempted
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)


def _train_loop(cfg, state, train_step, loader, mesh, ckpt_mgr, logger,
                schedule, update_interval, start_epoch, total_epochs,
                eval_interval, eval_cfg, ckpt_interval, log_interval,
                base_rng, global_step, history, max_steps, model,
                validate, preempted):
    with mesh:
        for epoch in range(start_epoch, total_epochs):
            loader.set_epoch(epoch)
            t0 = time.time()
            n_clips = 0
            for i, batch in enumerate(loader):
                device_batch = shard_batch(mesh, {
                    "imgs": batch["imgs"], "label": batch["label"]})
                state, metrics = train_step(state, device_batch, base_rng)
                n_clips += batch["imgs"].shape[0] * batch["imgs"].shape[1]
                global_step += 1
                if preempted.is_set():
                    ckpt_mgr.save(state, epoch)  # resume replays this epoch
                    logger.info(
                        f"preempted at epoch {epoch + 1} iter {i + 1}: "
                        f"checkpoint saved, exiting cleanly")
                    return state, history
                if (i + 1) % log_interval == 0 or i + 1 == len(loader):
                    m = {k: float(v) for k, v in
                         jax.device_get(metrics).items()}
                    ips = n_clips / max(time.time() - t0, 1e-9)
                    # LR derives from the optimizer's own step count (survives
                    # auto_resume, unlike the loop-local global_step)
                    opt_step = int(jax.device_get(state.step))
                    logger.info(
                        f"Epoch [{epoch + 1}][{i + 1}/{len(loader)}] "
                        f"lr: {float(schedule(opt_step // update_interval)):.3e} "
                        f"loss: {m['loss']:.4f} top1: {m['top1_acc']:.4f} "
                        f"top5: {m['top5_acc']:.4f} clips/s: {ips:.1f}")
                    history.append({"epoch": epoch, "iter": i + 1, **m})
                if max_steps and global_step >= max_steps:
                    break
            if (epoch + 1) % ckpt_interval == 0 or epoch + 1 == total_epochs:
                ckpt_mgr.save(state, epoch + 1)
            if eval_interval and ((epoch + 1) % eval_interval == 0
                                  or epoch + 1 == total_epochs):
                from adapt_image_models_tpu.apis.test import run_evaluation
                results = run_evaluation(cfg, model, state.params, mesh=mesh,
                                         split="val",
                                         model_state=state.model_state)
                logger.info(f"Epoch [{epoch + 1}] val: {results}")
                key = eval_cfg.get("save_best", "top1_acc")
                if key in results:
                    ckpt_mgr.save_best(state, epoch + 1, results[key])
            if max_steps and global_step >= max_steps:
                break
    return state, history
