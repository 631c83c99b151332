"""Parameter sharding rules over the (data, model) mesh.

The reference has no tensor parallelism (SURVEY.md §2.7) — this is a
superset. Rules (applied by path+shape against scan-stacked params):

* ``attn/in_proj_kernel  (L, D, 3D)`` -> shard 3D (heads) over 'model'
* ``attn/in_proj_bias    (L, 3D)``    -> shard over 'model'
* ``attn/out_proj/kernel (L, D, D)``  -> shard axis 1 (input=heads) over 'model'
* ``mlp/c_fc/kernel      (L, D, 4D)`` -> shard 4D over 'model'
* ``mlp/c_fc/bias        (L, 4D)``    -> shard over 'model'
* ``mlp/c_proj/kernel    (L, 4D, D)`` -> shard axis 1 over 'model'
* everything else replicated

This is the standard Megatron column/row split: one all-reduce per attention
and per MLP, emitted automatically by GSPMD from these shardings. Adapters
are tiny and stay replicated. With mesh model=1 everything degenerates to
pure data parallelism (the reference's DDP).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flax import traverse_util


def _spec_for(path, shape) -> P:
    parts = [str(p) for p in path]
    joined = "/".join(parts)
    nd = len(shape)
    if "attn" in joined and parts[-1] == "in_proj_kernel":
        return P(*([None] * (nd - 1) + ["model"]))
    if "attn" in joined and parts[-1] == "in_proj_bias":
        return P(*([None] * (nd - 1) + ["model"]))
    if "out_proj" in joined and parts[-1] == "kernel":
        return P(*([None] * (nd - 2) + ["model", None]))
    if "c_fc" in joined and parts[-1] == "kernel":
        return P(*([None] * (nd - 1) + ["model"]))
    if "c_fc" in joined and parts[-1] == "bias":
        return P(*([None] * (nd - 1) + ["model"]))
    if "c_proj" in joined and parts[-1] == "kernel":
        return P(*([None] * (nd - 2) + ["model", None]))
    return P()


def param_specs(params) -> Any:
    """PartitionSpec pytree for a param tree."""
    flat = traverse_util.flatten_dict(
        params.unfreeze() if hasattr(params, "unfreeze") else params)
    specs = {k: _spec_for(k, v.shape) for k, v in flat.items()}
    return traverse_util.unflatten_dict(specs)


def param_shardings(mesh: Mesh, params) -> Any:
    specs = param_specs(params)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def apply_param_shardings(mesh: Mesh, params):
    """device_put the params with TP shardings."""
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
