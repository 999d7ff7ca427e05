"""Center spatial pad/crop (channels-last).

Semantics match the reference ``spatial_padcrop``/``get_spatial_padcrop``
(``nets/nets_utils.py:22-99``): per spatial axis, pad or crop to the target
size with floor(d/2) on the low side and ceil(d/2) on the high side.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["spatial_padcrop", "get_spatial_padcrop"]


def get_spatial_padcrop(shape: Sequence[int], target_shape: Sequence[int]
                        ) -> Tuple[list, list]:
    """Per-axis (pad_lo, pad_hi) and (crop_lo, crop_hi) amounts."""
    padding, cropping = [], []
    for s, t in zip(shape, target_shape):
        d = t - s
        if d >= 0:
            padding.append((d // 2, d - d // 2))
            cropping.append((0, 0))
        else:
            d = -d
            padding.append((0, 0))
            cropping.append((d // 2, d - d // 2))
    return padding, cropping


def spatial_padcrop(x: jax.Array, target_shape: Sequence[int],
                    channel_first: bool = False) -> jax.Array:
    """Pad and/or crop the spatial axes of a (B, *spatial, C) tensor
    (or (B, C, *spatial) with ``channel_first=True``)."""
    spatial = x.shape[2:] if channel_first else x.shape[1:-1]
    assert len(spatial) == len(target_shape)
    if tuple(spatial) == tuple(target_shape):
        return x

    padding, cropping = get_spatial_padcrop(spatial, target_shape)
    lead = [(0, 0), (0, 0)] if channel_first else [(0, 0)]
    tail = [] if channel_first else [(0, 0)]

    if any(p != (0, 0) for p in padding):
        x = jnp.pad(x, lead + list(padding) + tail)

    if any(c != (0, 0) for c in cropping):
        spatial_now = x.shape[2:] if channel_first else x.shape[1:-1]
        idx = [slice(None)] * len(lead)
        for (lo, hi), s in zip(cropping, spatial_now):
            idx.append(slice(lo, s - hi))
        idx += [slice(None)] * len(tail)
        x = x[tuple(idx)]

    return x
