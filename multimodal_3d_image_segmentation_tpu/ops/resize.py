"""Spatial resampling (TPU-friendly, exact PyTorch semantics).

The reference uses ``torch.nn.functional.interpolate`` with
mode='bilinear'/'trilinear' (align_corners=False) for output upsampling
(``nets/hnosegxs.py:174-176``) and mode='nearest' for deep-supervision
upsampling (``nets/architectures.py:638-653``).

Linear interpolation is separable with exactly two taps per output sample,
so each axis is one pair of gathers + a weighted add (memory-bound) — NOT a
dense matmul, which for a 121 -> 240 upsample would burn ~100x the FLOPs on
zeros. Indices/weights are computed at trace time with the PyTorch
definitions:

  * linear, align_corners=False: src = (dst + 0.5) * in/out - 0.5, clamped.
  * nearest: src = floor(dst * in / out).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_linear", "resize_nearest"]


@functools.lru_cache(maxsize=None)
def _linear_taps_np(n_in: int, n_out: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lo_idx, hi_idx, hi_weight) per output sample, half-pixel centers."""
    dst = np.arange(n_out)
    src = (dst + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def resize_linear(x: jax.Array, sizes: Sequence[int],
                  channel_first: bool = False) -> jax.Array:
    """Bi/tri-linear resize of the spatial axes of (B, *spatial, C), or of
    (B, C, *spatial) with ``channel_first=True`` (preferred on TPU for few
    channels: gathers on a tiny minor dim pay heavy lane padding)."""
    axes = range(2, x.ndim) if channel_first else range(1, x.ndim - 1)
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        n_out = int(n_out)
        if n_in == n_out:
            continue
        lo, hi, w_hi = _linear_taps_np(n_in, n_out)
        shape = [1] * x.ndim
        shape[ax] = n_out
        # numpy constants: eager device consts would need a
        # device->host readback at lowering (flaky relay)
        w = np.asarray(w_hi, x.dtype).reshape(shape)
        x_lo = jnp.take(x, lo, axis=ax)
        x_hi = jnp.take(x, hi, axis=ax)
        x = x_lo + (x_hi - x_lo) * w
    return x


def resize_nearest(x: jax.Array, sizes: Sequence[int],
                   channel_first: bool = False) -> jax.Array:
    """Nearest-neighbor resize (floor indexing, PyTorch 'nearest')."""
    axes = range(2, x.ndim) if channel_first else range(1, x.ndim - 1)
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        idx = np.floor(np.arange(n_out) * (n_in / n_out)).astype(np.int64)
        idx = np.minimum(idx, n_in - 1)
        x = jnp.take(x, idx, axis=ax)
    return x
