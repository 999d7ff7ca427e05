"""Flat padded volume layout: (Dp, C, Npl) with the (H, W) plane on lanes.

Channels-last tensors with tiny C pay ~13x over the memory bound on every
elementwise pass (lane tiles pad C -> 128; measured in docs/DESIGN.md
§3d). The flat layout puts the flattened padded plane Hp*Wp on the lane
axis — full-bandwidth elementwise, lane-roll stencils, and per-plane MXU
dots — at the cost of explicit border bookkeeping:

  * geometry carries one zero plane/row/column on each side;
  * "clean" tensors have zero borders; ops that break this (bias adds,
    activations) produce "dirty" borders, which consumers remove exactly
    (kernels sanitize with the interior mask; transform stages slice the
    borders off at the small end of the contraction).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["FlatGeom", "flat_geom", "to_flat", "from_flat"]


class FlatGeom:
    """Static geometry of a flat padded volume (hashable for jit)."""

    def __init__(self, d: int, h: int, w: int):
        self.d, self.h, self.w = d, h, w
        self.hp, self.wp = h + 2, w + 2
        self.dp = d + 2
        self.np = self.hp * self.wp
        self.npl = -(-self.np // 128) * 128

    def __hash__(self):
        return hash((self.d, self.h, self.w))

    def __eq__(self, other):
        if not isinstance(other, FlatGeom):
            return NotImplemented
        return (self.d, self.h, self.w) == (other.d, other.h, other.w)

    def __repr__(self):
        return f"FlatGeom({self.d},{self.h},{self.w})"

    def interior_mask(self) -> np.ndarray:
        """(1, Npl) float32 0/1 mask of valid (non-border) positions."""
        m = np.zeros((self.hp, self.wp), np.float32)
        m[1:self.h + 1, 1:self.w + 1] = 1.0
        flat = np.zeros((1, self.npl), np.float32)
        flat[0, :self.np] = m.reshape(-1)
        return flat


def flat_geom(shape_or_d, h=None, w=None) -> FlatGeom:
    if h is None:
        d, h, w = shape_or_d
    else:
        d = shape_or_d
    return FlatGeom(int(d), int(h), int(w))


def to_flat(x4d: jax.Array, g: FlatGeom) -> jax.Array:
    """(C, D, H, W) -> flat (Dp, C, Npl) with clean zero borders."""
    xp = jnp.pad(x4d, ((0, 0), (1, 1), (1, 1), (1, 1)))
    xp = jnp.transpose(xp, (1, 0, 2, 3)).reshape(g.dp, x4d.shape[0], g.np)
    return jnp.pad(xp, ((0, 0), (0, 0), (0, g.npl - g.np)))


def from_flat(xf: jax.Array, g: FlatGeom) -> jax.Array:
    """flat (Dp, C, Npl) -> (C, D, H, W) (borders discarded)."""
    c = xf.shape[1]
    x = xf[1:g.d + 1, :, :g.np].reshape(g.d, c, g.hp, g.wp)
    x = x[:, :, 1:g.h + 1, 1:g.w + 1]
    return jnp.transpose(x, (1, 0, 2, 3))
