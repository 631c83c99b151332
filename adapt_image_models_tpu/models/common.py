"""Common video modules (reference ``mmaction/models/common/``):
Conv2plus1d (``conv2plus1d.py``, 104 LoC) and TAM (``tam.py``, 134 LoC).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = jnp.dtype


class Conv2plus1d(nn.Module):
    """R(2+1)D factorized 3D conv: spatial (1,k,k) -> BN+ReLU -> temporal
    (k,1,1), with the mid-channel count chosen to match the parameter
    budget of the full 3D conv (reference ``conv2plus1d.py``)."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        in_ch = x.shape[-1]
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.strides
        mid = (kt * kh * kw * in_ch * self.out_channels) // (
            kh * kw * in_ch + kt * self.out_channels)
        mid = max(1, mid)
        h = nn.Conv(mid, (1, kh, kw), (1, sh, sw), use_bias=self.use_bias,
                    dtype=cdt, name="conv_s")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="bn_s")(h))
        return nn.Conv(self.out_channels, (kt, 1, 1), (st, 1, 1),
                       use_bias=self.use_bias, dtype=cdt, name="conv_t")(h)


class TAM(nn.Module):
    """Temporal Adaptive Module (reference ``tam.py``): a GLOBAL branch that
    predicts a per-video temporal conv kernel (FC -> softmax over the
    adaptive kernel) and a LOCAL branch that predicts per-frame importance
    (temporal convs -> sigmoid). Input (B*T, H, W, C)."""

    num_segments: int
    alpha: int = 2
    adaptive_kernel_size: int = 3
    beta: int = 4
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cdt = self.compute_dtype
        bt, hh, ww, c = x.shape
        t = self.num_segments
        b = bt // t
        k = self.adaptive_kernel_size

        # (B, C, T) temporal descriptor
        desc = x.reshape(b, t, hh, ww, c).mean(axis=(2, 3))  # (B, T, C)
        desc = desc.transpose(0, 2, 1)  # (B, C, T)

        # global branch: per-(video, channel) adaptive kernel over T
        g = nn.Dense(t * self.alpha, dtype=cdt, name="g_fc1")(desc)
        g = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="g_bn")(g))
        g = nn.Dense(k, dtype=cdt, name="g_fc2")(g)  # (B, C, K)
        kernel = jax.nn.softmax(g, axis=-1)

        # local branch: per-frame importance (B, C, T) -> sigmoid
        l = nn.Conv(c // self.beta, (3,), padding="SAME", dtype=cdt,
                    name="l_conv1")(desc.transpose(0, 2, 1))  # (B, T, C/beta)
        l = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name="l_bn")(l))
        l = nn.Conv(c, (3,), padding="SAME", dtype=cdt, name="l_conv2")(l)
        importance = jax.nn.sigmoid(l)  # (B, T, C)

        # apply local importance
        xt = x.reshape(b, t, hh, ww, c) * importance[:, :, None, None, :]

        # apply the adaptive temporal convolution (depthwise over T with a
        # per-(video, channel) kernel): unroll over the small K
        pad = k // 2
        xp = jnp.pad(xt, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        out = jnp.zeros_like(xt)
        for i in range(k):
            w_i = kernel[:, :, i][:, None, None, None, :]  # (B,1,1,1,C)
            out = out + xp[:, i:i + t] * w_i
        return out.reshape(bt, hh, ww, c).astype(x.dtype)


class ConvAudio(nn.Module):
    """Separable audio stem conv (reference ``models/common/conv_audio.py:8``):
    parallel (K, 1) and (1, K) conv+BN+ReLU branches, concatenated (or
    summed) over channels. Input NHWC (freq-time spectrogram)."""

    out_channels: int
    kernel_size: int = 9
    op: str = "concat"
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.op not in ("concat", "sum"):
            raise ValueError(f"op must be concat/sum, got {self.op}")
        cdt = self.compute_dtype
        k = self.kernel_size
        # when concatenating, each branch carries half the output channels
        ch = self.out_channels // 2 if self.op == "concat" else self.out_channels
        s = (self.stride, self.stride)
        x1 = nn.Conv(ch, (k, 1), s, use_bias=False, dtype=cdt,
                     name="conv_1")(x)
        x1 = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                  momentum=0.9, name="bn_1")(x1))
        x2 = nn.Conv(ch, (1, k), s, use_bias=False, dtype=cdt,
                     name="conv_2")(x)
        x2 = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                  momentum=0.9, name="bn_2")(x2))
        if self.op == "concat":
            return jnp.concatenate([x1, x2], axis=-1)
        return x1 + x2
