"""Orbax checkpointing with the reference's ergonomics.

Parity with ``mmcv_custom/runner/checkpoint.py:14`` + the CheckpointHook:
epoch-interval saves carrying meta (epoch/step) + optimizer state, a
``latest`` pointer for ``auto_resume`` (``epoch_based_runner.py:122-126``),
``max_keep_ckpts`` pruning, and EvalHook-style ``save_best``. The apex-amp
state the reference persists has no TPU counterpart (bf16 needs no loss
scale). Frozen params are saved too so a checkpoint is self-contained like
the reference's full ``state_dict``.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def checkpoint_tag(path: str):
    """``<work_dir>/ckpt_<epoch|best>`` (trailing slash tolerated — orbax
    checkpoints are directories) -> ``int`` epoch or ``'best'``."""
    base = os.path.basename(os.path.normpath(path))
    if not base.startswith("ckpt_"):
        raise ValueError(f"expected a .../ckpt_<epoch|best> path, got {path!r}")
    tag = base[len("ckpt_"):]
    return tag if tag == "best" else int(tag)


class CheckpointManager:
    def __init__(self, work_dir: str, max_keep: Optional[int] = None):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)
        self.max_keep = max_keep
        self._ckpt = ocp.PyTreeCheckpointer()

    # ------------------------------------------------------------------
    def _path(self, tag) -> str:
        return os.path.join(self.work_dir, f"ckpt_{tag}")

    def _meta_path(self) -> str:
        return os.path.join(self.work_dir, "checkpoints.json")

    def _read_meta(self) -> Dict[str, Any]:
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                return json.load(f)
        return {"latest": None, "all": [], "best": None, "best_score": None}

    def _write_meta(self, meta: Dict[str, Any]):
        with open(self._meta_path(), "w") as f:
            json.dump(meta, f, indent=1)

    # ------------------------------------------------------------------
    @staticmethod
    def _state_tree(state, epoch: int) -> Dict[str, Any]:
        tree = {
            "trainable": state.trainable,
            "frozen": state.frozen,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
        }
        # BatchNorm/batch_stats collections (orbax rejects empty subtrees, so
        # only include when present)
        if jax.tree_util.tree_leaves(state.model_state):
            tree["model_state"] = state.model_state
        return tree

    def save(self, state, epoch: int, extra: Optional[Dict[str, Any]] = None):
        tree = self._state_tree(state, epoch)
        path = self._path(epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, tree)
        meta = self._read_meta()
        meta["latest"] = epoch
        meta["all"] = sorted(set(meta["all"] + [epoch]))
        if extra:
            meta.setdefault("extra", {})[str(epoch)] = extra
        if self.max_keep:
            keep = meta["all"][-self.max_keep:]
            for e in meta["all"]:
                if e not in keep and e != meta.get("best"):
                    p = self._path(e)
                    if os.path.exists(p):
                        shutil.rmtree(p)
            meta["all"] = keep
        self._write_meta(meta)
        return path

    def save_best(self, state, epoch: int, score: float,
                  rule: str = "greater") -> bool:
        """EvalHook save_best semantics (``eval_hooks.py:241+``)."""
        meta = self._read_meta()
        prev = meta.get("best_score")
        better = (prev is None or
                  (score > prev if rule == "greater" else score < prev))
        if not better:
            return False
        tree = self._state_tree(state, epoch)
        path = self._path("best")
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, tree)
        meta["best"] = epoch
        meta["best_score"] = float(score)
        self._write_meta(meta)
        return True

    # ------------------------------------------------------------------
    def latest_epoch(self) -> Optional[int]:
        return self._read_meta().get("latest")

    def restore_variables(self, epoch: Optional[int] = None
                          ) -> Dict[str, Any]:
        """Restore a checkpoint into a flax ``variables`` dict
        (``{'params': ..., <model_state collections>...}``) without a
        TrainState template — the inference/demo load path. ``epoch``
        also accepts the tag ``'best'``."""
        if epoch is None:
            epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"no checkpoints in {self.work_dir}")
        from adapt_image_models_tpu.parallel.partition import merge_params
        tree = self._ckpt.restore(self._path(epoch))
        variables = {"params": merge_params(tree["trainable"],
                                            tree["frozen"])}
        for coll, sub in (tree.get("model_state") or {}).items():
            variables[coll] = sub
        return variables

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into the structure of ``state``; returns (state, epoch)."""
        if epoch is None:
            epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"no checkpoints in {self.work_dir}")
        template = self._state_tree(state, 0)
        tree = self._ckpt.restore(self._path(epoch), item=template)
        import jax.numpy as jnp
        new_state = state.replace(
            trainable=tree["trainable"], frozen=tree["frozen"],
            opt_state=tree["opt_state"],
            model_state=tree.get("model_state", state.model_state),
            step=jnp.asarray(tree["step"], jnp.int32))
        return new_state, int(tree["epoch"])
