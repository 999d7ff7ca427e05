"""Depth-axis spatial sharding for the flat Pallas conv kernel.

``conv3_flat`` streams depth planes of a flat ``(Dp, C, Npl)`` volume,
so the natural spatial shard axis is depth: each device holds a
contiguous run of valid planes and a k=3 depth stencil needs exactly ONE
halo plane from each neighbor. This module does that composition:

  * ``halo_exchange`` — ``ppermute`` the boundary planes along the mesh
    axis (zeros at the global volume ends), producing the local
    ``(d_local + 2, C, Npl)`` tensor the kernel expects;
  * ``conv3_flat_sharded`` — ``shard_map`` the whole pipeline: exchange,
    run ``conv3_flat(halo=True)`` per device, ``psum`` the GroupNorm
    moment sums so normalization stays exactly global.

This retires the "fastest path and biggest-volume path are exclusive"
caveat at the kernel level: the same Pallas conv that wins single-device
(docs/DESIGN.md §3d) now runs under ``n_spatial > 1``. The reference is
strictly single-GPU (``experiments/run.py:39``); both the kernel and the
sharding are rebuild-native capability.

Differentiability: ``shard_map`` transposes ``ppermute`` to the reverse
permutation and ``conv3_flat``'s custom VJP replays the XLA reference in
halo mode, so gradients flow (asserted in ``tests/test_parallel.py``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .mesh import SPATIAL_AXIS

try:  # jax >= 0.6 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import PartitionSpec as P

__all__ = ["halo_exchange", "conv3_flat_sharded"]


def halo_exchange(x_local: jax.Array, axis_name: str,
                  axis_size: int) -> jax.Array:
    """(d_local, C, Npl) valid planes -> (d_local + 2, C, Npl) with the
    neighbors' boundary planes attached (exact zeros at the global
    volume ends — the SAME-conv zero-pad semantics)."""
    if axis_size == 1:
        z = jnp.zeros_like(x_local[:1])
        return jnp.concatenate([z, x_local, z], axis=0)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    prev = jax.lax.ppermute(x_local[-1:], axis_name, fwd)  # from idx-1
    nxt = jax.lax.ppermute(x_local[:1], axis_name, bwd)    # from idx+1
    prev = jnp.where(idx == 0, jnp.zeros_like(prev), prev)
    nxt = jnp.where(idx == axis_size - 1, jnp.zeros_like(nxt), nxt)
    return jnp.concatenate([prev, x_local, nxt], axis=0)


def conv3_flat_sharded(x_flat: jax.Array, kernel: jax.Array,
                       bias: jax.Array, g, mesh,
                       prologue: Optional[Tuple[jax.Array, jax.Array]]
                       = None, prologue_act: Optional[str] = None,
                       precision: str = "bf16x3",
                       interpret: Optional[bool] = None,
                       emit_stats: bool = False,
                       residual: Optional[Tuple[jax.Array, jax.Array]]
                       = None, axis_name: str = SPATIAL_AXIS):
    """``conv3_flat`` of a GLOBAL flat volume, depth-sharded over
    ``mesh``'s ``axis_name`` axis.

    Takes and returns global ``(Dp, C, Npl)`` flat tensors (same
    contract as ``conv3_flat``); internally the valid ``D`` planes are
    shard_map'd across the axis, each device exchanges one halo plane
    with its neighbors and runs the streaming Pallas kernel locally,
    and ``emit_stats`` moment sums are ``psum``'d so a following
    GroupNorm is exactly the single-device computation.

    ``D = g.d`` must be divisible by the axis size (the V-Net's plane
    counts are powers-of-two multiples per level; pick the mesh
    accordingly).
    """
    from ..kernels.conv3d_flat import conv3_flat
    from ..ops.flatvol import flat_geom

    n = mesh.shape[axis_name]
    if g.d % n != 0:
        raise ValueError(
            f"conv3_flat_sharded: D={g.d} valid planes do not divide "
            f"over {axis_name}={n} devices")
    g_loc = flat_geom(g.d // n, g.h, g.w)  # same h/w -> same Npl/mask

    def local(xv, k, b, pro, res):
        xh = halo_exchange(xv, axis_name, n)
        idx = jax.lax.axis_index(axis_name)
        # global-end halos are zero pads, not data (re-zeroed in-kernel
        # post-prologue)
        keep = jnp.stack([idx > 0, idx < n - 1]).astype(jnp.float32)
        out = conv3_flat(xh, k, b, g_loc, prologue=pro,
                         prologue_act=prologue_act, precision=precision,
                         interpret=interpret, emit_stats=emit_stats,
                         residual=res, halo=True, halo_keep=keep)
        outs = list(out) if isinstance(out, tuple) else [out]
        y = outs.pop(0)[1:-1]  # local valid planes
        r = outs.pop(0)[1:-1] if residual is not None else None
        rest = [jax.lax.psum(s, axis_name) for s in outs]  # moment sums
        return tuple(v for v in ([y, r] + rest) if v is not None)

    spec_planes = P(axis_name, None, None)
    n_out = 1 + (residual is not None) + emit_stats * (
        1 + (residual is not None))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec_planes, P(), P(), P(), P()),
        out_specs=tuple([spec_planes] * (1 + (residual is not None))
                        + [P()] * (n_out - 1 - (residual is not None))),
        check_vma=False)

    out = fn(x_flat[1:-1], kernel, bias, prologue, residual)
    outs = list(out)
    pad = lambda t: jnp.pad(t, ((1, 1), (0, 0), (0, 0)))  # noqa: E731
    y = pad(outs.pop(0))
    res = [y] + ([pad(outs.pop(0))] if residual is not None else [])
    res += outs
    return tuple(res) if len(res) > 1 else res[0]
