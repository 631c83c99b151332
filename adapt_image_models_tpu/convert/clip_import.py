"""OpenAI CLIP visual-encoder -> flax AIM parameter converter.

The reference loads CLIP weights with ``clip.load(...)`` and pours the
visual state_dict into its ViT, dropping the output projection ``proj``
(``mmaction/models/backbones/vitclip_aim.py:374-396``). This module does the
equivalent key mapping into the flax/scan layout:

torch key                                     -> flax path (this repo)
conv1.weight (D,3,P,P)                        -> conv1/kernel (P,P,3,D)
class_embedding (D,)                          -> class_embedding
positional_embedding (N,D)                    -> positional_embedding
ln_pre.{weight,bias}                          -> ln_pre/{scale,bias}
ln_post.{weight,bias}                         -> ln_post/{scale,bias}
transformer.resblocks.{i}.attn.in_proj_weight -> transformer/resblocks/attn/in_proj_kernel[i] (transposed)
transformer.resblocks.{i}.attn.in_proj_bias   -> .../attn/in_proj_bias[i]
transformer.resblocks.{i}.attn.out_proj.*     -> .../attn/out_proj/{kernel,bias}[i] (weight transposed)
transformer.resblocks.{i}.ln_{1,2}.*          -> .../ln_{1,2}/{scale,bias}[i]
transformer.resblocks.{i}.mlp.c_{fc,proj}.*   -> .../mlp/c_{fc,proj}/{kernel,bias}[i] (weights transposed)
proj                                          -> dropped

Per-layer tensors are stacked on axis 0 because blocks are ``nn.scan``-stacked.
Adapters / temporal_embedding are NOT in CLIP checkpoints and keep their init.

Inputs are a flat dict of numpy arrays — use :func:`state_dict_to_numpy` to
get one from a torch state_dict, keeping torch an optional dependency.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Any

import numpy as np
from flax import traverse_util


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """torch state_dict (or any mapping of array-likes) -> numpy dict."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _stack(sd: Dict[str, np.ndarray], fmt: str, layers: int) -> np.ndarray:
    return np.stack([sd[fmt.format(i)] for i in range(layers)], axis=0)


def convert_clip_visual(sd: Mapping[str, Any], layers: int) -> Dict:
    """CLIP visual state_dict (numpy or torch values) -> flax AIM subtree.

    Returns a nested dict covering exactly the frozen-CLIP parameters;
    merge it over an initialised param tree with :func:`load_clip_into_params`.
    """
    sd = state_dict_to_numpy(sd)
    f32 = lambda x: np.asarray(x, np.float32)
    flat: Dict[tuple, np.ndarray] = {}

    flat[("conv1", "kernel")] = f32(sd["conv1.weight"]).transpose(2, 3, 1, 0)
    flat[("class_embedding",)] = f32(sd["class_embedding"])
    flat[("positional_embedding",)] = f32(sd["positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        flat[(ln, "scale")] = f32(sd[f"{ln}.weight"])
        flat[(ln, "bias")] = f32(sd[f"{ln}.bias"])

    rb = ("transformer", "resblocks")
    pre = "transformer.resblocks.{}."
    flat[rb + ("attn", "in_proj_kernel")] = f32(
        _stack(sd, pre + "attn.in_proj_weight", layers)).transpose(0, 2, 1)
    flat[rb + ("attn", "in_proj_bias")] = f32(
        _stack(sd, pre + "attn.in_proj_bias", layers))
    flat[rb + ("attn", "out_proj", "kernel")] = f32(
        _stack(sd, pre + "attn.out_proj.weight", layers)).transpose(0, 2, 1)
    flat[rb + ("attn", "out_proj", "bias")] = f32(
        _stack(sd, pre + "attn.out_proj.bias", layers))
    for ln in ("ln_1", "ln_2"):
        flat[rb + (ln, "scale")] = f32(_stack(sd, pre + ln + ".weight", layers))
        flat[rb + (ln, "bias")] = f32(_stack(sd, pre + ln + ".bias", layers))
    for lin in ("c_fc", "c_proj"):
        flat[rb + ("mlp", lin, "kernel")] = f32(
            _stack(sd, pre + f"mlp.{lin}.weight", layers)).transpose(0, 2, 1)
        flat[rb + ("mlp", lin, "bias")] = f32(
            _stack(sd, pre + f"mlp.{lin}.bias", layers))

    return traverse_util.unflatten_dict(flat)


def load_clip_into_params(params: Dict, clip_sd: Mapping[str, Any],
                          layers: int, backbone_path=("backbone_module",)) -> Dict:
    """Merge converted CLIP weights over an initialised recognizer param tree.

    ``params`` is the tree under 'params' (i.e. ``variables['params']``).
    Shapes are validated against the existing tree; raises on mismatch.
    """
    converted = traverse_util.flatten_dict(convert_clip_visual(clip_sd, layers))
    flat = dict(traverse_util.flatten_dict(params))
    for k, v in converted.items():
        full = tuple(backbone_path) + k
        if full not in flat:
            raise KeyError(f"converted CLIP key {'/'.join(full)} not in model params")
        if tuple(flat[full].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(full)}: model {flat[full].shape} "
                f"vs checkpoint {v.shape}")
        flat[full] = v.astype(np.asarray(flat[full]).dtype)
    return traverse_util.unflatten_dict(flat)
