"""Released-AIM-checkpoint -> flax parameter converter.

The reference publishes mmcv-format checkpoints
(``mmcv_custom/runner/checkpoint.py:14``: ``{'meta', 'state_dict',
'optimizer', 'amp'}``) whose ``state_dict`` keys are prefixed ``backbone.``
(the AIM ViT incl. adapters + temporal_embedding) and ``cls_head.``
(``fc_cls``). This converts such a state_dict — CLIP weights, adapters,
temporal embedding and classifier — into this repo's flax tree.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
from flax import traverse_util

from adapt_image_models_tpu.convert.clip_import import (
    convert_clip_visual, state_dict_to_numpy,
)

ADAPTER_NAMES = (
    "S_Adapter", "T_Adapter", "T_Adapter_in", "MLP_Adapter",
    # ZeroI2V linear adapters (vit_clip_zeroI2V.py:125-136)
    "Attn_Adapter_in", "Attn_Adapter_q", "Attn_Adapter_k", "Attn_Adapter_v",
    "Attn_Adapter_out", "MLP_Adapter_in", "MLP_Adapter_out",
)


# The AIM_FLASH family checkpoints name attention/MLP weights in
# flash-attn's layout (``vitclip_aim_flash.py:146`` FlashMHA -> ``Wqkv`` /
# ``out_proj``; ``:151`` FlashMlp -> ``fc1``/``fc2``) instead of CLIP's
# (``in_proj_weight``, ``c_fc``/``c_proj``). Both pack qkv as [q; k; v]
# rows, so the rename is an exact alias.
_FLASH_KEY_ALIASES = (
    (".attn.Wqkv.weight", ".attn.in_proj_weight"),
    (".attn.Wqkv.bias", ".attn.in_proj_bias"),
    (".mlp.fc1.", ".mlp.c_fc."),
    (".mlp.fc2.", ".mlp.c_proj."),
)


def _normalize_flash_keys(bsd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in bsd.items():
        for old, new in _FLASH_KEY_ALIASES:
            if old in k:
                k = k.replace(old, new)
                break
        out[k] = v
    return out


def _num_layers(sd: Mapping[str, np.ndarray], prefix: str) -> int:
    idx = set()
    for k in sd:
        if k.startswith(prefix + "transformer.resblocks."):
            idx.add(int(k.split("transformer.resblocks.")[1].split(".")[0]))
    if not idx:
        raise ValueError("no transformer.resblocks.* keys found")
    return max(idx) + 1


def convert_aim_checkpoint(checkpoint: Mapping[str, Any],
                           backbone_prefix: str = "backbone.",
                           head_prefix: str = "cls_head.") -> Dict:
    """Full AIM checkpoint -> nested flax param dict.

    ``checkpoint`` may be the raw mmcv dict (with a 'state_dict' key) or the
    state_dict itself. Returns a tree with 'backbone_module' and
    'head_module' roots matching :class:`Recognizer3D`.
    """
    sd = checkpoint.get("state_dict", checkpoint) if isinstance(checkpoint, dict) else checkpoint
    sd = state_dict_to_numpy(sd)
    f32 = lambda x: np.asarray(x, np.float32)

    bsd = {k[len(backbone_prefix):]: v for k, v in sd.items()
           if k.startswith(backbone_prefix)}
    bsd = _normalize_flash_keys(bsd)
    layers = _num_layers(sd, backbone_prefix)

    # frozen CLIP core
    tree = convert_clip_visual(bsd, layers)
    flat = dict(traverse_util.flatten_dict(tree))

    # temporal embedding
    if "temporal_embedding" in bsd:
        flat[("temporal_embedding",)] = f32(bsd["temporal_embedding"])

    # adapters (stacked over layers), torch Linear (out,in) -> kernel (in,out)
    rb_fmt = "transformer.resblocks.{}."
    for name in ADAPTER_NAMES:
        probe = rb_fmt.format(0) + f"{name}.D_fc1.weight"
        if probe not in bsd:
            continue
        for fc in ("D_fc1", "D_fc2"):
            w = np.stack([f32(bsd[rb_fmt.format(i) + f"{name}.{fc}.weight"])
                          for i in range(layers)], 0).transpose(0, 2, 1)
            b = np.stack([f32(bsd[rb_fmt.format(i) + f"{name}.{fc}.bias"])
                          for i in range(layers)], 0)
            flat[("transformer", "resblocks", name, fc, "kernel")] = w
            flat[("transformer", "resblocks", name, fc, "bias")] = b

    out_flat = {("backbone_module",) + k: v for k, v in flat.items()}

    # classifier head
    hw = head_prefix + "fc_cls.weight"
    if hw in sd:
        out_flat[("head_module", "fc_cls", "kernel")] = f32(sd[hw]).T
        out_flat[("head_module", "fc_cls", "bias")] = f32(sd[head_prefix + "fc_cls.bias"])

    return traverse_util.unflatten_dict(out_flat)


def load_aim_checkpoint_into_params(params: Dict, checkpoint: Mapping[str, Any],
                                    strict: bool = True) -> Dict:
    """Merge a converted AIM checkpoint over an initialised param tree."""
    converted = traverse_util.flatten_dict(convert_aim_checkpoint(checkpoint))
    flat = dict(traverse_util.flatten_dict(params))
    missing = [k for k in converted if k not in flat]
    if missing and strict:
        raise KeyError(f"checkpoint keys not in model: "
                       f"{['/'.join(m) for m in missing][:8]}")
    for k, v in converted.items():
        if k not in flat:
            continue
        if tuple(flat[k].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {'/'.join(k)}: "
                             f"model {flat[k].shape} vs ckpt {v.shape}")
        flat[k] = v.astype(np.asarray(flat[k]).dtype)
    return traverse_util.unflatten_dict(flat)
