"""Discrete Hartley transforms (full-grid, FFT-backed).

API-parity layer with the reference ``nets/dht.py:16-66`` (``dhtn``/``dht2``/
``dht3``): H(x) = Re(FFT(x)) - Im(FFT(x)), forward normalized by 1/N and
inverse unnormalized so frequency magnitudes are resolution-invariant
(zero-shot super-resolution keystone, reference ``nets/dht.py:29-32``).

These operate on arbitrary axes; the production models use the pruned
matmul transforms in :mod:`.spectral` instead of full-grid FFTs.
"""
from __future__ import annotations

from typing import Sequence

import jax

from .spectral import dht_full

__all__ = ["dhtn", "dht2", "dht3"]


def dhtn(x: jax.Array, dim: Sequence[int], is_inverse: bool = False):
    """(Inverse) discrete Hartley transform over the given dimensions."""
    return dht_full(x, axes=tuple(dim), is_inverse=is_inverse)


def dht2(x: jax.Array, is_inverse: bool = False):
    """(Inverse) DHT over the two innermost dimensions."""
    return dhtn(x, dim=(-2, -1), is_inverse=is_inverse)


def dht3(x: jax.Array, is_inverse: bool = False):
    """(Inverse) DHT over the three innermost dimensions."""
    return dhtn(x, dim=(-3, -2, -1), is_inverse=is_inverse)
