"""AIM backbone — frozen CLIP ViT + spatial/temporal/joint adapters.

TPU-native reimplementation of the canonical AIM model
(reference ``mmaction/models/backbones/vitclip_aim.py:341-469``; block math
at ``:195-211``). Key behavioural parity points:

* patch embed: conv(P, stride P, no bias) -> tokens; prepend class embed;
  add positional embedding (``:445-452``)
* temporal embedding added in ``(B*N, T, D)`` layout (``:454-457``)
* per block (``:195-211``):
    1. temporal adaptation: reshape to frame axis, full attention over T with
       the SAME (frozen) attention weights, ``T_Adapter`` (no skip; optional
       ``T_Adapter_in`` with skip when ``num_tadapter == 2``), residual with
       drop-path
    2. spatial adaptation: ``x + S_Adapter(attn(ln_1(x)))``
       (``S_Adapter`` carries its own inner residual)
    3. joint adaptation: ``x + mlp(ln_2(x)) + drop_path(scale * MLP_Adapter(ln_2(x)))``
* zero-init of every adapter's second projection so the model starts exactly
  at the CLIP image-model function (``:398-423``)
* trainable set = adapters + temporal_embedding + ln_post (``:424-427``);
  here that split lives in ``parallel/partition.py`` as a pytree partition —
  gradients are only ever taken w.r.t. the trainable sub-tree, so XLA never
  materialises frozen weight gradients.

TPU-first design choices (deliberately NOT the reference's):
* batch-first ``(B*T, N, D)`` layout everywhere (no LND permutes)
* blocks stacked with ``nn.scan`` -> one compiled block body regardless of
  depth (12 for ViT-B, 24 for ViT-L); per-layer drop-path rates ride in as a
  scanned array
* drop-path masks per-sample on the true batch axis (the reference's timm
  DropPath on an LND tensor masked per token row — a latent bug we do not
  replicate; eval numerics are unaffected since drop-path is train-only)
* optional ``jax.checkpoint`` rematerialisation per block replaces
  ``torch.utils.checkpoint`` (``vit_clip.py:315-321``)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from adapt_image_models_tpu.models.builder import BACKBONES
from adapt_image_models_tpu.models.layers import (
    Adapter, AdapterParams, CLIPAttention, CLIPMLP, CLIPMLPParams,
    LayerNormFP32, LayerNormParams, trunc_normal_02,
)
from adapt_image_models_tpu.ops.fused_joint_mlp import (
    fused_joint_block, fused_joint_mlp_rows, fused_joint_train_block,
)

Dtype = jnp.dtype


def drop_path_gate(rng: jax.Array, batch: int, rate: jax.Array) -> jax.Array:
    """Per-sample stochastic-depth gate: 0 or 1/keep, shape (batch,)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=(batch,))
    return mask.astype(jnp.float32) / keep.astype(jnp.float32)


def drop_path(rng: Optional[jax.Array], x: jax.Array, rate: jax.Array,
              deterministic: bool) -> jax.Array:
    """Stochastic depth with a (possibly traced) per-layer rate.

    Implemented as a multiply by a per-sample gate rather than
    ``jnp.where``: a where saves its full-broadcast ``pred`` tensor for the
    backward (measured 450 MB per scanned mask at ViT-B batch 32), while the
    multiply saves only the (B, 1, ...) gate."""
    if deterministic or rng is None:
        return x
    gate = drop_path_gate(rng, x.shape[0], rate)
    return x * gate.astype(x.dtype).reshape((x.shape[0],) + (1,) * (x.ndim - 1))


class AIMBlock(nn.Module):
    """One AIM residual attention block (reference ``vitclip_aim.py:112-211``)."""

    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    num_tadapter: int = 1
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"
    joint_core: str = "sample"  # 'sample' | 'rows' | 'xla' (fused eval only)
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, dpr: jax.Array) -> Tuple[jax.Array, None]:
        # x: (B*T, N, D)
        deterministic = self.deterministic
        bt, n, d = x.shape
        t = self.num_frames
        b = bt // t

        attn = CLIPAttention(self.num_heads, compute_dtype=self.compute_dtype,
                             attention_core=self.attention_core,
                             frozen_backward=not deterministic, name="attn")
        # ln_1/ln_2 expose raw scale/bias so the fused kernels run them in
        # their prologues (identical param tree to LayerNormFP32)
        ln_1 = LayerNormParams(d, name="ln_1")
        ln_2 = LayerNormParams(d, name="ln_2")
        mlp = CLIPMLPParams(d, compute_dtype=self.compute_dtype, name="mlp")
        # NOTE: fused attention+adapter-epilogue kernels exist
        # (ops/fused_*_attention.py) but measured SLOWER than letting XLA
        # overlap the small adapter matmuls with the next kernel
        # (223 -> 215 clips/s), so blocks keep the separate adapters.
        # train: remat the XLA-applied adapters — their GELU hiddens
        # otherwise persist per layer across the scan (576 MB per adapter
        # per save at ViT-B batch 64; recompute is ~2% of step FLOPs)
        adapter_cls = (AdapterParams if deterministic
                       else nn.remat(AdapterParams))
        # spatial/temporal steps run fully in-kernel in BOTH modes when
        # fused (adapter weights consumed directly) -> plain AdapterParams;
        # remat only matters when an adapter is XLA-applied — which the
        # num_tadapter=2 branch does even under attention_core='fused'
        # (t_adapter/T_Adapter_in wrap the kernel), so it keeps remat
        step_adapter_cls = (AdapterParams
                            if (self.attention_core == "fused"
                                and self.num_tadapter != 2)
                            else adapter_cls)
        s_adapter = step_adapter_cls(d, skip_connect=True,
                                     compute_dtype=self.compute_dtype,
                                     name="S_Adapter")
        t_adapter = step_adapter_cls(d, skip_connect=False,
                                     compute_dtype=self.compute_dtype,
                                     name="T_Adapter")
        mlp_adapter = AdapterParams(d, skip_connect=False,
                                    compute_dtype=self.compute_dtype,
                                    name="MLP_Adapter")

        rng = self.make_rng("dropout") if not deterministic else None
        if rng is not None:
            rng_t, rng_m = jax.random.split(rng)
        else:
            rng_t = rng_m = None

        # 1. temporal adaptation -------------------------------------------
        # every patch position attends over frames; LN/adapters/projections
        # are per-token so they run in the native (B*T, N, D) layout — only
        # the attention core batches over frames (no materialized relayout).
        # ln_1 fuses into the kernel prologue unless T_Adapter_in sits
        # between LN and attention.
        if self.num_tadapter == 2:
            xt = Adapter(compute_dtype=self.compute_dtype,
                         name="T_Adapter_in")(ln_1(x))
            xt = t_adapter(attn(xt, temporal_frames=t))
            x = x + drop_path(rng_t, xt, dpr, deterministic)
        elif self.attention_core == "fused":
            # whole step in one kernel, both modes; train passes the
            # drop-path gate in (per sample-frame) and uses the in-kernel
            # backward (CLIPAttention.frozen_backward)
            t_gate = (drop_path_gate(rng_t, bt, dpr)
                      if not deterministic and rng_t is not None else None)
            x = attn(x, temporal_frames=t, ln=ln_1, adapter=t_adapter,
                     residual=True, gate=t_gate)
        else:
            xt = t_adapter(attn(x, temporal_frames=t, ln=ln_1))
            x = x + drop_path(rng_t, xt, dpr, deterministic)

        # 2. spatial adaptation --------------------------------------------
        # no drop-path on this step (reference :208), so the whole step runs
        # in one kernel in BOTH modes; train uses the in-kernel backward
        # (CLIPAttention.frozen_backward routes to fused_spatial_train_step)
        if self.attention_core == "fused":
            x = attn(x, ln=ln_1, adapter=s_adapter, residual=True)
        else:
            x = x + s_adapter(attn(x, ln=ln_1))

        # 3. joint adaptation ----------------------------------------------
        # eval path: ln_2 + MLP + MLP_Adapter + residual in one Pallas kernel
        # (no ln_2 reduction pass, no (BT, N, 4D) hidden round-trip); train
        # keeps the XLA composition because drop_path splits the sum
        if (self.attention_core == "fused" and deterministic
                and self.joint_core != "xla"):
            cdt = self.compute_dtype
            if self.joint_core == "rows":
                x = fused_joint_mlp_rows(
                    x.astype(cdt), ln_2.scale, ln_2.bias, *mlp.weights(cdt),
                    *mlp_adapter.weights(cdt), float(self.adapter_scale))
            else:
                x = fused_joint_block(
                    x.astype(cdt), ln_2.scale, ln_2.bias, *mlp.weights(cdt),
                    *mlp_adapter.weights(cdt), float(self.adapter_scale))
        elif self.attention_core == "fused" and self.joint_core != "xla":
            # TRAIN path: gated rows kernel with the Pallas backward —
            # the XLA joint backward saves the (B*L, 4D) hidden per layer
            # across the scan (3 x 3.46 GB at ViT-B batch 32; the dominant
            # OOM source), this saves only (x, weights, gate). Valid only
            # with the CLIP MLP + ln_2 frozen (apis/train guards).
            cdt = self.compute_dtype
            gate = (drop_path_gate(rng_m, bt, dpr) if rng_m is not None
                    else jnp.ones((bt,), jnp.float32))
            gate_rows = jnp.repeat(gate, n)
            x = fused_joint_train_block(
                x.astype(cdt), ln_2.scale, ln_2.bias, *mlp.weights(cdt),
                *mlp_adapter.weights(cdt), gate_rows,
                float(self.adapter_scale))
        else:
            xn = ln_2(x)
            scale = jnp.asarray(self.adapter_scale, x.dtype)
            x = x + mlp(xn) + drop_path(rng_m, scale * mlp_adapter(xn), dpr,
                                        deterministic)
        return x, None


class AIMWindowBlock(nn.Module):
    """AIM block with 3D (shifted-)window attention + temporal-cls prompt
    (reference ``vitclip_aim.py:212-287``).

    Per layer: window attention over patch tokens (cyclic shift + additive
    mask on odd layers unless ``not_shift``), temporal attention on the cls
    token, ``T_Adapter`` over both, optional prompt insertion of the
    temporal cls into spatial attention, then the canonical spatial/joint
    adaptation. Scan-compatible: the per-layer shift rides in as a scanned
    0/1 flag (roll amount and mask are multiplied by it).
    """

    num_heads: int
    num_frames: int
    input_hw: int  # H == W of the patch grid
    adapter_scale: float = 0.5
    window_size: tuple = (32, 2, 2)
    prompt: bool = True
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, scan_in) -> Tuple[jax.Array, None]:
        from adapt_image_models_tpu.models.backbones.window import (
            get_window_size, window_partition, window_reverse,
            compute_shift_mask, pad_to_windows,
        )
        dpr, shift_flag = scan_in
        deterministic = self.deterministic
        bt, n, d = x.shape
        t = self.num_frames
        b = bt // t
        h = w = self.input_hw
        if h * w != n - 1:
            raise ValueError(f"token count {n} != {h}x{w}+1")

        attn = CLIPAttention(self.num_heads, compute_dtype=self.compute_dtype,
                             attention_core=self.attention_core, name="attn")
        ln_1 = LayerNormFP32(name="ln_1")
        ln_2 = LayerNormFP32(name="ln_2")
        mlp = CLIPMLP(compute_dtype=self.compute_dtype, name="mlp")
        s_adapter = Adapter(compute_dtype=self.compute_dtype, name="S_Adapter")
        t_adapter = Adapter(skip_connect=False, compute_dtype=self.compute_dtype,
                            name="T_Adapter")
        mlp_adapter = Adapter(skip_connect=False, compute_dtype=self.compute_dtype,
                              name="MLP_Adapter")

        rng = self.make_rng("dropout") if not deterministic else None
        rng_t, rng_m = (jax.random.split(rng) if rng is not None
                        else (None, None))

        base_shift = tuple(i // 2 for i in self.window_size)
        window_size, shift_size = get_window_size((t, h, w),
                                                  self.window_size, base_shift)
        # static mask for the shifted configuration; zeroed by the flag on
        # unshifted layers
        import numpy as _np
        wt, wh, ww = window_size
        tp = -(-t // wt) * wt
        hp = -(-h // wh) * wh
        wp = -(-w // ww) * ww
        if any(shift_size):
            mask_np = compute_shift_mask(tp, hp, wp, window_size, shift_size)
        else:
            l_win = wt * wh * ww
            n_win = (tp // wt) * (hp // wh) * (wp // ww)
            mask_np = _np.zeros((n_win, l_win, l_win), _np.float32)
        shift_mask = jnp.asarray(mask_np)

        cls_tok, patches = x[:, :1, :], x[:, 1:, :]

        # ---- window attention over patch tokens ---------------------------
        win = ln_1(patches).reshape(b, t, h, w, d)
        win = pad_to_windows(win, window_size)
        roll_t = (-shift_size[0] * shift_flag).astype(jnp.int32)
        roll_h = (-shift_size[1] * shift_flag).astype(jnp.int32)
        roll_w = (-shift_size[2] * shift_flag).astype(jnp.int32)
        win = jnp.roll(win, (roll_t, roll_h, roll_w), axis=(1, 2, 3))
        parts = window_partition(win, window_size)  # (B*nW, L, D)
        n_win = parts.shape[0] // b
        mask = (shift_flag.astype(jnp.float32)
                * jnp.tile(shift_mask, (b, 1, 1))[:, None])  # (B*nW, 1, L, L)
        parts = attn(parts, mask=mask)
        win = window_reverse(parts.astype(self.compute_dtype), window_size,
                             b, tp, hp, wp)
        win = jnp.roll(win, (-roll_t, -roll_h, -roll_w), axis=(1, 2, 3))
        win = win[:, :t, :h, :w, :].reshape(bt, h * w, d)

        # ---- temporal attention on the cls token --------------------------
        cls_attn = attn(ln_1(cls_tok), temporal_frames=t)  # (BT, 1, D)

        xt = jnp.concatenate([cls_attn, win], axis=1)
        x = x + drop_path(rng_t, t_adapter(xt), dpr, deterministic)

        # ---- spatial adaptation (+ temporal-cls prompt token) -------------
        if self.prompt:
            # insert the temporal cls as a prompt token for spatial attention
            # then drop it (reference `:271-281`); S_Adapter is per-token so
            # dropping before the adapter equals the reference's drop-after
            xp = jnp.concatenate([x[:, :1], cls_attn.astype(x.dtype),
                                  x[:, 1:]], axis=1)
            attn_out = attn(ln_1(xp))
            attn_kept = jnp.concatenate([attn_out[:, :1], attn_out[:, 2:]],
                                        axis=1)
            x = x + s_adapter(attn_kept)
        else:
            x = x + s_adapter(attn(ln_1(x)))

        # ---- joint adaptation ---------------------------------------------
        xn = ln_2(x)
        scale = jnp.asarray(self.adapter_scale, x.dtype)
        x = x + mlp(xn) + drop_path(rng_m, scale * mlp_adapter(xn), dpr,
                                    deterministic)
        return x, None


class AIMTransformer(nn.Module):
    """Depth-stacked AIM blocks via ``nn.scan`` (one traced block body)."""

    layers: int
    num_heads: int
    num_frames: int
    adapter_scale: float = 0.5
    num_tadapter: int = 1
    drop_path_rate: float = 0.0
    use_checkpoint: bool = False
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"
    joint_core: str = "sample"
    wind_attn: bool = False
    window_size: tuple = (32, 2, 2)
    not_shift: bool = True
    prompt: bool = True
    input_hw: int = 14

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dpr = jnp.linspace(0.0, self.drop_path_rate, self.layers)

        if self.wind_attn:
            # alternating shifted windows on odd layers (vitclip_aim.py:317)
            shift_flags = jnp.asarray(
                [0.0 if (i % 2 == 0 or self.not_shift) else 1.0
                 for i in range(self.layers)], jnp.float32)
            block_cls = AIMWindowBlock
            if self.use_checkpoint:
                block_cls = nn.remat(AIMWindowBlock)
            ScanBlocks = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=((0, 0),),
                length=self.layers,
            )
            blocks = ScanBlocks(
                num_heads=self.num_heads,
                num_frames=self.num_frames,
                input_hw=self.input_hw,
                adapter_scale=self.adapter_scale,
                window_size=tuple(self.window_size),
                prompt=self.prompt,
                compute_dtype=self.compute_dtype,
                attention_core=self.attention_core,
                deterministic=deterministic,
                name="resblocks",
            )
            x, _ = blocks(x, (dpr, shift_flags))
            return x

        block_cls = AIMBlock
        if self.use_checkpoint:
            block_cls = nn.remat(AIMBlock)

        ScanBlocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,),
            length=self.layers,
        )
        blocks = ScanBlocks(
            num_heads=self.num_heads,
            num_frames=self.num_frames,
            adapter_scale=self.adapter_scale,
            num_tadapter=self.num_tadapter,
            compute_dtype=self.compute_dtype,
            attention_core=self.attention_core,
            joint_core=self.joint_core,
            deterministic=deterministic,
            name="resblocks",
        )
        x, _ = blocks(x, dpr)
        return x


@BACKBONES.register_module()
class AIM(nn.Module):
    """CLIP ViT image encoder with AIM adapters (reference ``vitclip_aim.py:341``).

    Input  : ``(B, C, T, H, W)`` float (NCTHW, matching ``FormatShape``)
    Output : ``(B, T, D)`` per-frame class-token features
             (the reference emits ``(B, D, T, 1, 1)`` for its I3D head —
             same information, TPU-friendly layout).
    """

    input_resolution: int = 224
    num_frames: int = 8
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    drop_path_rate: float = 0.2
    num_tadapter: int = 1
    adapter_scale: float = 0.5
    use_checkpoint: bool = False
    compute_dtype: Dtype = jnp.float32
    attention_core: str = "xla"
    joint_core: str = "sample"
    # window-attention path (reference vitclip_aim.py:212-287, :343-344)
    wind_attn: bool = False
    window_size: tuple = (32, 2, 2)
    not_shift: bool = True
    prompt: bool = True
    pretrained: Optional[str] = None  # handled by convert/clip_import.py

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, c, t, h, w = x.shape
        if t != self.num_frames:
            raise ValueError(f"got T={t}, model built for num_frames={self.num_frames}")
        d = self.width
        n_patches = (self.input_resolution // self.patch_size) ** 2

        cdt = self.compute_dtype
        # (B, C, T, H, W) -> (B*T, H, W, C): NHWC is the native conv layout on TPU
        xt = x.transpose(0, 2, 3, 4, 1).reshape(b * t, h, w, c).astype(cdt)
        xt = nn.Conv(d, kernel_size=(self.patch_size, self.patch_size),
                     strides=(self.patch_size, self.patch_size), use_bias=False,
                     dtype=cdt, kernel_init=trunc_normal_02, name="conv1")(xt)
        xt = xt.reshape(b * t, -1, d)  # (B*T, N_patches, D)

        scale = d ** -0.5
        class_embedding = self.param(
            "class_embedding",
            lambda k, s: scale * jax.random.normal(k, s, jnp.float32), (d,))
        positional_embedding = self.param(
            "positional_embedding",
            lambda k, s: scale * jax.random.normal(k, s, jnp.float32),
            (n_patches + 1, d))
        temporal_embedding = self.param(
            "temporal_embedding", nn.initializers.zeros,
            (1, self.num_frames, d), jnp.float32)

        cls = jnp.broadcast_to(class_embedding.astype(cdt), (b * t, 1, d))
        xt = jnp.concatenate([cls, xt], axis=1)  # (B*T, N, D)
        xt = xt + positional_embedding.astype(cdt)

        n = xt.shape[1]
        # temporal embedding rides the (B*N, T, D) layout (vitclip_aim.py:454-457)
        xt = xt.reshape(b, t, n, d).transpose(0, 2, 1, 3)
        xt = xt + temporal_embedding.astype(cdt)[None]
        xt = xt.transpose(0, 2, 1, 3).reshape(b * t, n, d)

        xt = LayerNormFP32(name="ln_pre")(xt)

        xt = AIMTransformer(
            layers=self.layers, num_heads=self.heads,
            num_frames=self.num_frames, adapter_scale=self.adapter_scale,
            num_tadapter=self.num_tadapter, drop_path_rate=self.drop_path_rate,
            use_checkpoint=self.use_checkpoint, compute_dtype=cdt,
            attention_core=self.attention_core, joint_core=self.joint_core,
            wind_attn=self.wind_attn, window_size=tuple(self.window_size),
            not_shift=self.not_shift, prompt=self.prompt,
            input_hw=self.input_resolution // self.patch_size,
            name="transformer")(xt, deterministic=deterministic)

        xt = LayerNormFP32(name="ln_post")(xt)
        cls_tok = xt[:, 0]  # (B*T, D)
        return cls_tok.reshape(b, t, d)


def vit_b16_config(**overrides):
    cfg = dict(type="AIM", input_resolution=224, patch_size=16, width=768,
               layers=12, heads=12, drop_path_rate=0.2, adapter_scale=0.5,
               num_tadapter=1, num_frames=8)
    cfg.update(overrides)
    return cfg


def vit_l14_config(**overrides):
    cfg = dict(type="AIM", input_resolution=224, patch_size=14, width=1024,
               layers=24, heads=16, drop_path_rate=0.2, adapter_scale=0.5,
               num_tadapter=1, num_frames=8)
    cfg.update(overrides)
    return cfg
