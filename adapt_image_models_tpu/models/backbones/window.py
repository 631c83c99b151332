"""3D (shifted-)window attention utilities for the AIM window path
(reference ``vitclip_aim.py:16-75`` window_partition/reverse/compute_mask).

All shapes static; the cyclic shift uses a traced roll amount so shifted and
unshifted layers share one ``nn.scan`` body (the additive mask is zeroed for
unshifted layers).
"""

from __future__ import annotations

from functools import reduce
from operator import mul
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def get_window_size(x_size: Tuple[int, int, int],
                    window_size: Tuple[int, int, int],
                    shift_size: Tuple[int, int, int]):
    """Clamp windows to the input extent; zero the shift on clamped axes
    (reference ``vitclip_aim.py:47-60``)."""
    ws = list(window_size)
    ss = list(shift_size)
    for i in range(3):
        if x_size[i] <= window_size[i]:
            ws[i] = x_size[i]
            ss[i] = 0
    return tuple(ws), tuple(ss)


def window_partition(x: jax.Array, window_size: Tuple[int, int, int]) -> jax.Array:
    """(B, T, H, W, C) -> (B*nW, wt*wh*ww, C)."""
    b, t, h, w, c = x.shape
    wt, wh, ww = window_size
    x = x.reshape(b, t // wt, wt, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, reduce(mul, window_size), c)


def window_reverse(windows: jax.Array, window_size: Tuple[int, int, int],
                   b: int, t: int, h: int, w: int) -> jax.Array:
    """Inverse of :func:`window_partition` -> (B, T, H, W, C)."""
    wt, wh, ww = window_size
    x = windows.reshape(b, t // wt, h // wh, w // ww, wt, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t, h, w, -1)


def compute_shift_mask(t: int, h: int, w: int,
                       window_size: Tuple[int, int, int],
                       shift_size: Tuple[int, int, int]) -> np.ndarray:
    """Additive attention mask (nW, L, L) for the shifted configuration
    (reference ``compute_mask``, ``vitclip_aim.py:62-75``). Pure numpy:
    computed once at trace time, baked as a constant."""
    img = np.zeros((1, t, h, w, 1), np.float32)
    cnt = 0
    # literal reference slicing (incl. its -0 semantics): numpy slices behave
    # identically to torch's here
    for d in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0]),
              slice(-shift_size[0], None)):
        for hh in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1]),
                   slice(-shift_size[1], None)):
            for ww_ in (slice(-window_size[2]), slice(-window_size[2], -shift_size[2]),
                        slice(-shift_size[2], None)):
                img[:, d, hh, ww_, :] = cnt
                cnt += 1
    b, tt, hh, www, c = img.shape
    wt, wh, ww = window_size
    x = img.reshape(1, tt // wt, wt, hh // wh, wh, www // ww, ww, 1)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wt * wh * ww)
    diff = x[:, None, :] - x[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def pad_to_windows(x: jax.Array, window_size: Tuple[int, int, int]) -> jax.Array:
    """Pad (B, T, H, W, C) so each spatial-temporal dim divides the window."""
    b, t, h, w, c = x.shape
    wt, wh, ww = window_size
    pad_t = (wt - t % wt) % wt
    pad_h = (wh - h % wh) % wh
    pad_w = (ww - w % ww) % ww
    if pad_t or pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
    return x
