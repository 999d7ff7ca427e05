"""Per-modality intensity normalization (host side, numpy).

Re-design of reference ``experiments/utils.py:25-71``: z-score per modality
with optional exclusion of a mask value (background) from the statistics,
optional clipping, and mask refill with 0 (the post-normalization mean).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["normalize_data", "normalize_modalities"]


def normalize_data(data, mask_val=None, clip_val: Optional[Tuple] = None
                   ) -> np.ndarray:
    """Normalize a single modality."""
    data = np.asarray(data, dtype=np.float32)
    if clip_val is not None:
        data = np.clip(data, *clip_val)

    from . import native
    out = native.zscore_masked(data.copy(), mask_val) \
        if native.available() else None
    if out is not None:
        return out

    if mask_val is not None:
        mask = data == mask_val
        sel = data[~mask]
        if sel.size == 0:
            return np.zeros_like(data)
        mean, std = sel.mean(), sel.std()
        std = std if std > 0 else 1.0  # constant modality: no inf/NaN
        out = (data - mean) / std      # (matches the native path's guard)
        out[mask] = 0.0  # mean 0 / std 1 after normalization
        return np.asarray(out, dtype=np.float32)
    mean, std = data.mean(), data.std()
    std = std if std > 0 else 1.0
    return np.asarray((data - mean) / std, dtype=np.float32)


def normalize_modalities(data, mask_val=None, clip_val=None) -> np.ndarray:
    """Normalize each channel of a channel-first multimodal array
    independently."""
    return np.stack([normalize_data(da, mask_val=mask_val, clip_val=clip_val)
                     for da in data])
