"""Label utilities (one-hot, remapping) — on-device, jit-compatible.

Re-designs of reference ``experiments/utils.py:74-119``.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["to_categorical", "remap_labels"]


def to_categorical(y, num_classes: int) -> jnp.ndarray:
    """(B, 1, *spatial) int labels -> (B, num_classes, *spatial) one-hot
    float32, channel-first (reference ``experiments/utils.py:74-97``)."""
    assert y.shape[1] == 1, "Can only handle single label per pixel."
    y = jnp.asarray(y)[:, 0].astype(jnp.int32)
    onehot = (y[..., None] == jnp.arange(num_classes)).astype(jnp.float32)
    return jnp.moveaxis(onehot, -1, 1)


def remap_labels(label, mapping: Optional[Dict[int, int]]):
    """Remap integer labels via a {old: new} dict. Works on numpy arrays
    and jax arrays (reference ``experiments/utils.py:100-119``)."""
    if mapping is None:
        return label
    if isinstance(label, np.ndarray):
        out = label.copy()
        for k, v in mapping.items():
            out[label == k] = v
        return out
    label = jnp.asarray(label)
    out = label
    for k, v in mapping.items():
        out = jnp.where(label == k, np.asarray(v, label.dtype), out)
    return out
