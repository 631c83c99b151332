"""timm/ImageNet ViT checkpoint -> flax ViT_ImageNet converter.

Reference loads ``jx_vit_base_p16_224-80ecf9dd.pth`` and aliases
``norm.* -> ln_post.*`` (``vit_imagenet.py:197-200``). Key map:

patch_embed.proj.weight (D,3,P,P) -> patch_embed/kernel (P,P,3,D)
cls_token / pos_embed             -> cls_token / pos_embed
blocks.{i}.norm{1,2}.*            -> blocks/norm{1,2}/ln/{scale,bias}[i]
blocks.{i}.attn.qkv.*             -> blocks/attn/in_proj_{kernel,bias}[i]
blocks.{i}.attn.proj.*            -> blocks/attn/out_proj/{kernel,bias}[i]
blocks.{i}.mlp.fc{1,2}.*          -> blocks/mlp/fc{1,2}/{kernel,bias}[i]
norm.*                            -> ln_post/ln/{scale,bias}
"""

from __future__ import annotations

from typing import Dict, Mapping, Any

import numpy as np
from flax import traverse_util

from adapt_image_models_tpu.convert.clip_import import state_dict_to_numpy


def convert_timm_vit(sd: Mapping[str, Any], depth: int) -> Dict:
    sd = state_dict_to_numpy(sd)
    f32 = lambda x: np.asarray(x, np.float32)
    stack = lambda fmt: np.stack([f32(sd[fmt.format(i)]) for i in range(depth)], 0)

    flat: Dict[tuple, np.ndarray] = {}
    flat[("patch_embed", "kernel")] = f32(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)
    if "patch_embed.proj.bias" in sd:
        flat[("patch_embed", "bias")] = f32(sd["patch_embed.proj.bias"])
    flat[("cls_token",)] = f32(sd["cls_token"])
    flat[("pos_embed",)] = f32(sd["pos_embed"])
    for norm in ("norm1", "norm2"):
        flat[("blocks", norm, "ln", "scale")] = stack(f"blocks.{{}}.{norm}.weight")
        flat[("blocks", norm, "ln", "bias")] = stack(f"blocks.{{}}.{norm}.bias")
    flat[("blocks", "attn", "in_proj_kernel")] = stack(
        "blocks.{}.attn.qkv.weight").transpose(0, 2, 1)
    if "blocks.0.attn.qkv.bias" in sd:
        flat[("blocks", "attn", "in_proj_bias")] = stack("blocks.{}.attn.qkv.bias")
    flat[("blocks", "attn", "out_proj", "kernel")] = stack(
        "blocks.{}.attn.proj.weight").transpose(0, 2, 1)
    flat[("blocks", "attn", "out_proj", "bias")] = stack("blocks.{}.attn.proj.bias")
    for fc in ("fc1", "fc2"):
        flat[("blocks", "mlp", fc, "kernel")] = stack(
            f"blocks.{{}}.mlp.{fc}.weight").transpose(0, 2, 1)
        flat[("blocks", "mlp", fc, "bias")] = stack(f"blocks.{{}}.mlp.{fc}.bias")
    ln_key = "ln_post" if "ln_post.weight" in sd else "norm"
    flat[("ln_post", "ln", "scale")] = f32(sd[f"{ln_key}.weight"])
    flat[("ln_post", "ln", "bias")] = f32(sd[f"{ln_key}.bias"])
    return traverse_util.unflatten_dict(flat)


def load_timm_into_params(params: Dict, sd: Mapping[str, Any], depth: int,
                          backbone_path=("backbone_module",)) -> Dict:
    converted = traverse_util.flatten_dict(convert_timm_vit(sd, depth))
    flat = dict(traverse_util.flatten_dict(params))
    for k, v in converted.items():
        full = tuple(backbone_path) + k
        if full not in flat:
            raise KeyError(f"converted timm key {'/'.join(full)} not in model params")
        if tuple(flat[full].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {'/'.join(full)}: "
                             f"model {flat[full].shape} vs ckpt {v.shape}")
        flat[full] = v.astype(np.asarray(flat[full]).dtype)
    return traverse_util.unflatten_dict(flat)
