"""Feature Bank Operators + FBOHead + LFBInferHead
(reference ``mmaction/models/heads/fbo_head.py:19,171,283,299,315`` and
``lfb_infer_head.py:16``).

TPU shape: the reference casts everything as 1x1x1 3D convs over
(N, C, S, 1, 1) tensors; here short/long-term features are plain token
arrays — st (N, S, C), lt (N, L, C) — so every "conv" is a Dense and the
non-local core is two batched matmuls that XLA maps straight onto the MXU.
Long-term features arrive as a fixed-shape batch input (sampled host-side
by ``models/lfb.py``), never via in-graph dict lookup.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import HEADS

Dtype = jnp.dtype


class NonLocalLayer(nn.Module):
    """One non-local block over (st tokens) x (lt tokens)
    (reference ``fbo_head.py:19-168``)."""

    latent_channels: int
    st_feat_channels: int
    use_scale: bool = True
    pre_activate: bool = True
    pre_activate_with_ln: bool = True
    dropout_ratio: float = 0.2
    zero_init_out_conv: bool = False
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, st_feat: jax.Array, lt_feat: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        c = self.latent_channels
        theta = nn.Dense(c, dtype=self.compute_dtype,
                         name="st_feat_conv")(st_feat)      # (N, S, c)
        phi = nn.Dense(c, dtype=self.compute_dtype,
                       name="lt_feat_conv")(lt_feat)        # (N, L, c)
        g = nn.Dense(c, dtype=self.compute_dtype,
                     name="global_conv")(lt_feat)           # (N, L, c)

        attn = jnp.einsum("nsc,nlc->nsl", theta, phi,
                          preferred_element_type=jnp.float32)
        if self.use_scale:
            attn = attn / (c ** 0.5)
        p = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nsl,nlc->nsc", p.astype(g.dtype), g,
                         preferred_element_type=jnp.float32)
        out = out.astype(st_feat.dtype)

        if self.pre_activate:
            if self.pre_activate_with_ln:
                out = nn.LayerNorm(name="ln")(out)
            out = nn.relu(out)
        out = nn.Dense(
            self.st_feat_channels, dtype=self.compute_dtype,
            kernel_init=(nn.initializers.zeros if self.zero_init_out_conv
                         else nn.initializers.lecun_normal()),
            name="out_conv")(out)
        if not self.pre_activate:
            out = nn.LayerNorm(name="ln")(out)
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio)(
                out, deterministic=deterministic)
        return out


class FBONonLocal(nn.Module):
    """Stack of non-local layers fusing long-term context into the
    short-term roi feature (reference ``fbo_head.py:171-281``)."""

    st_feat_channels: int
    lt_feat_channels: int
    latent_channels: int
    num_non_local_layers: int = 2
    st_feat_dropout_ratio: float = 0.2
    lt_feat_dropout_ratio: float = 0.2
    pre_activate: bool = True
    zero_init_out_conv: bool = False
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, st_feat: jax.Array, lt_feat: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        st = nn.Dense(self.latent_channels, dtype=self.compute_dtype,
                      name="st_feat_conv")(st_feat)
        if self.st_feat_dropout_ratio > 0:
            st = nn.Dropout(self.st_feat_dropout_ratio)(
                st, deterministic=deterministic)
        lt = nn.Dense(self.latent_channels, dtype=self.compute_dtype,
                      name="lt_feat_conv")(lt_feat)
        if self.lt_feat_dropout_ratio > 0:
            lt = nn.Dropout(self.lt_feat_dropout_ratio)(
                lt, deterministic=deterministic)

        out = st
        for idx in range(self.num_non_local_layers):
            identity = out
            nl = NonLocalLayer(
                latent_channels=self.latent_channels,
                st_feat_channels=self.latent_channels,
                pre_activate=self.pre_activate,
                zero_init_out_conv=self.zero_init_out_conv,
                compute_dtype=self.compute_dtype,
                name=f"non_local_layer_{idx + 1}")(
                    out, lt, deterministic=deterministic)
            out = identity + nl
            if not self.pre_activate:
                out = nn.relu(out)
        return out


class FBOAvg(nn.Module):
    @nn.compact
    def __call__(self, st_feat, lt_feat, deterministic=True):
        return jnp.mean(lt_feat, axis=1, keepdims=True)


class FBOMax(nn.Module):
    @nn.compact
    def __call__(self, st_feat, lt_feat, deterministic=True):
        return jnp.max(lt_feat, axis=1, keepdims=True)


_FBO_DICT = {"non_local": FBONonLocal, "avg": FBOAvg, "max": FBOMax}


@HEADS.register_module()
class FBOHead(nn.Module):
    """Fuse pooled roi features with sampled long-term features
    (reference ``fbo_head.py:315-409``).

    Call with roi_feat (B, R, O, O, C) (the RoIAlign output layout of
    ``roi_extractors/single_straight3d.py``) and lt_feat (B, R, L, C_lt)
    sampled host-side; returns (B, R, C + C_fbo) fused features.
    """

    fbo_cfg: Dict[str, Any]
    temporal_pool_type: str = "avg"
    spatial_pool_type: str = "max"
    compute_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.temporal_pool_type in ("max", "avg")
        assert self.spatial_pool_type in ("max", "avg")
        cfg = dict(self.fbo_cfg)
        fbo_type = cfg.pop("type", "non_local")
        # reference cfg carries the (shape-implied on TPU) sequence lengths
        cfg.pop("num_st_feat", None)
        cfg.pop("num_lt_feat", None)
        assert fbo_type in _FBO_DICT, f"unknown fbo type {fbo_type}"
        self.fbo = _FBO_DICT[fbo_type](**cfg)

    def __call__(self, roi_feat: jax.Array, lt_feat: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        b, r = roi_feat.shape[:2]
        # 6D input (B, R, T, O, O, C): temporal pool first with its own
        # mode (reference pools T and HW separately, fbo_head.py:352-366)
        if roi_feat.ndim == 6:
            if self.temporal_pool_type == "avg":
                roi_feat = jnp.mean(roi_feat, axis=2)
            else:
                roi_feat = jnp.max(roi_feat, axis=2)
        axes = tuple(range(2, roi_feat.ndim - 1))
        if self.spatial_pool_type == "avg":
            st = jnp.mean(roi_feat, axis=axes)
        else:
            st = jnp.max(roi_feat, axis=axes)
        st = st.reshape(b * r, 1, -1)
        lt = lt_feat.reshape(b * r, *lt_feat.shape[2:])
        fbo_feat = self.fbo(st, lt, deterministic=deterministic)
        out = jnp.concatenate([st[:, 0], fbo_feat[:, 0]], axis=-1)
        return out.reshape(b, r, -1)


@HEADS.register_module()
class LFBInferHead:
    """Collect pooled roi features + img_keys to build the feature bank
    (reference ``lfb_infer_head.py:16-109``). Host-side: call ``collect``
    per batch with device outputs, then ``save`` once after the loop (the
    reference hides the save in ``__del__``)."""

    def __init__(self, lfb_prefix_path: str, dataset_mode: str = "train",
                 use_half_precision: bool = True,
                 spatial_pool_type: str = "max"):
        import os
        os.makedirs(lfb_prefix_path, exist_ok=True)
        assert spatial_pool_type in ("max", "avg")
        self.lfb_prefix_path = lfb_prefix_path
        self.dataset_mode = dataset_mode
        self.use_half_precision = use_half_precision
        self.spatial_pool_type = spatial_pool_type
        self.all_features: List[np.ndarray] = []
        self.all_metadata: List[str] = []

    def collect(self, roi_feat: np.ndarray, img_keys: List[str]) -> None:
        """roi_feat: (N, O, O, C) or (N, C); img_keys: N '<video>,<sec>'."""
        feat = np.asarray(roi_feat)
        if feat.ndim > 2:
            axes = tuple(range(1, feat.ndim - 1))
            feat = (feat.max(axis=axes) if self.spatial_pool_type == "max"
                    else feat.mean(axis=axes))
        if self.use_half_precision:
            feat = feat.astype(np.float16)
        assert len(feat) == len(img_keys)
        self.all_features.extend(list(feat))
        self.all_metadata.extend(img_keys)

    def save(self) -> str:
        import os.path as osp
        from adapt_image_models_tpu.models.lfb import save_lfb

        bank: Dict[str, Dict[int, list]] = {}
        for feature, metadata in zip(self.all_features, self.all_metadata):
            video_id, timestamp = metadata.split(",")
            bank.setdefault(video_id, {}).setdefault(
                int(timestamp), []).append(feature)
        bank = {vid: {sec: np.stack(feats) for sec, feats in secs.items()}
                for vid, secs in bank.items()}
        path = osp.normpath(osp.join(self.lfb_prefix_path,
                                     f"lfb_{self.dataset_mode}.npz"))
        save_lfb(path, bank, self.use_half_precision)
        return path
