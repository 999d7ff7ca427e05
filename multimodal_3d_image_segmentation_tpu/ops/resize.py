"""Spatial resampling as per-axis matmuls (TPU-friendly, exact semantics).

The reference uses ``torch.nn.functional.interpolate`` with
mode='bilinear'/'trilinear' (align_corners=False) for output upsampling
(``nets/hnosegxs.py:174-176``) and mode='nearest' for deep-supervision
upsampling (``nets/architectures.py:638-653``). On TPU a separable resize is
a chain of small dense matmuls (one per axis) that run on the MXU — and the
interpolation matrices are computed once at trace time, so semantics are
bit-exact with the PyTorch definitions:

  * linear, align_corners=False: src = (dst + 0.5) * in/out - 0.5, clamped.
  * nearest: src = floor(dst * in / out).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_linear", "resize_nearest"]


@functools.lru_cache(maxsize=None)
def _linear_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) interpolation matrix, half-pixel centers."""
    if n_in == n_out:
        return np.eye(n_in)
    dst = np.arange(n_out)
    src = (dst + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = src - lo
    mat = np.zeros((n_in, n_out))
    mat[lo, dst] += 1.0 - w_hi
    mat[hi, dst] += w_hi
    return mat


def resize_linear(x: jax.Array, sizes: Sequence[int]) -> jax.Array:
    """Bi/tri-linear resize of the spatial axes of (B, *spatial, C)."""
    axes = range(1, x.ndim - 1)
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        mat = jnp.asarray(_linear_matrix_np(n_in, int(n_out)), x.dtype)
        x = jnp.moveaxis(jnp.tensordot(x, mat, axes=[[ax], [0]]), -1, ax)
    return x


def resize_nearest(x: jax.Array, sizes: Sequence[int]) -> jax.Array:
    """Nearest-neighbor resize (floor indexing, PyTorch 'nearest')."""
    axes = range(1, x.ndim - 1)
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        idx = np.floor(np.arange(n_out) * (n_in / n_out)).astype(np.int64)
        idx = np.minimum(idx, n_in - 1)
        x = jnp.take(x, jnp.asarray(idx), axis=ax)
    return x
