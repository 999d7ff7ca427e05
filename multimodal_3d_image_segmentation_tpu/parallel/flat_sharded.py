"""Whole-model depth-axis spatial sharding for the flat V-Net path.

``parallel/halo.py`` composes ONE ``conv3_flat`` with a depth-sharded
mesh axis (one-plane ``ppermute`` halo, ``psum``'d GroupNorm moments).
This module extends that composition to the WHOLE ``VNetDS._flat_forward``
so the fastest (Pallas kernel) path and the biggest-volume (spatially
sharded) path are no longer exclusive at the model level:

  * ``FlatShardCtx`` — the per-trace context threaded through the flat
    modules: halo exchange, global-end keep pair, moment ``psum``,
    gather/re-shard transitions.
  * ``shard_schedule`` — the static per-level sharded/replicated plan.
    A V-Net level is depth-sharded when its plane count divides the axis
    and the *local* count stays even across the stride-2 transition
    (local phase decimation then equals the global one); the first level
    that fails the test runs replicated on every device (deep levels are
    a small fraction of total traffic — filters double but voxels shrink
    8x per level), and the decode path re-shards by local slab when it
    returns to a sharded level (no communication: the tensor is already
    replicated).
  * ``make_flat_sharded_apply`` — ``shard_map`` wrapper for the train /
    predict engines (params replicated, volume depth-sharded, output
    replicated). Differentiable: ``shard_map`` transposes the
    ``ppermute``/``psum``/``all_gather`` and the kernels' custom VJPs
    replay the XLA reference in halo mode.

The reference is strictly single-GPU (``experiments/run.py:39``); both
the kernels and this sharding are rebuild-native capability (SURVEY
§2.4/§5.7 — the CP/ring-attention analog for volumetric data).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .halo import halo_exchange
from .mesh import SPATIAL_AXIS

try:  # jax >= 0.6 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import PartitionSpec as P

__all__ = ["FlatShardCtx", "shard_schedule", "flat_vnet_shardable",
           "make_flat_sharded_apply", "maybe_flat_sharded_apply"]


class FlatShardCtx:
    """Depth-shard context for flat ``(Dp, C, Npl)`` tensors inside a
    ``shard_map``. Between ops, local tensors keep the single-device
    border convention (``d_local + 2`` planes, borders zero or dirty);
    each sharded conv re-exchanges its halos from the interior planes.

    ``dim`` selects WHICH image axis becomes the flat path's plane-major
    ("depth") axis: the k=3 stencils are isotropic, so the forward is
    permutation-equivariant once the conv kernels' spatial axes are
    permuted along (``kperm``). This matters at real shapes — the
    BraTS'23 flagship's first two axes resize to 121 planes (odd, never
    divisible) while the third gives 78."""

    def __init__(self, axis: str, n: int, dim: int = 0):
        self.axis, self.n, self.dim = axis, int(n), int(dim)
        sperm = (self.dim,) + tuple(k for k in range(3) if k != self.dim)
        self.sperm = sperm                     # image axes -> flat axes
        self.kperm = sperm + (3, 4)            # DHWIO conv kernels
        inv = [0, 0, 0]
        for k in range(3):
            inv[sperm[k]] = k
        self.sperm_inv = tuple(inv)

    def halo(self, x_local: jax.Array) -> jax.Array:
        """Replace the (garbage) border planes with the neighbors'
        boundary planes (zeros at the global ends)."""
        return halo_exchange(x_local[1:-1], self.axis, self.n)

    def keep(self) -> jax.Array:
        """(2,) validity of the first/last halo plane (0 at the global
        volume ends, where the exchanged plane is a zero pad that the
        kernel must re-zero post-prologue)."""
        idx = jax.lax.axis_index(self.axis)
        return jnp.stack([idx > 0, idx < self.n - 1]).astype(jnp.float32)

    def gather_planes(self, x_local: jax.Array) -> jax.Array:
        """Local (d_loc + 2, C, Npl) -> replicated global (D + 2, C, Npl)
        with clean zero borders."""
        inter = jax.lax.all_gather(x_local[1:-1], self.axis, axis=0,
                                   tiled=True)
        return jnp.pad(inter, ((1, 1), (0, 0), (0, 0)))

    def local_slab(self, x_global: jax.Array, d_local: int) -> jax.Array:
        """Replicated global flat tensor -> this shard's local tensor
        (border planes = the adjacent global planes; consumers
        re-exchange, so their content is irrelevant)."""
        idx = jax.lax.axis_index(self.axis)
        return jax.lax.dynamic_slice_in_dim(x_global, idx * d_local,
                                            d_local + 2, 0)


def shard_schedule(d0: int, num_sections: int, n: int) -> list:
    """Static sharded/replicated plan per V-Net level.

    ``d0`` = entry flat depth (post conv_in when ``use_resize``). Level
    depths follow the flat path's ceil-halving (``(d - 1) // 2 + 1``).
    Level j is sharded iff every level above is, its depth divides ``n``
    with >= 2 local planes, and (for j > 0) the parent's LOCAL count is
    even (shard-local stride-2 phase decimation == global decimation).
    """
    sharded = []
    d, ok = d0, True
    for j in range(num_sections):
        ok = ok and d % n == 0 and d // n >= 2
        sharded.append(ok)
        ok = ok and (d // n) % 2 == 0  # next level's local decimation
        d = (d - 1) // 2 + 1
    return sharded


def flat_vnet_shardable(image_size: Sequence[int], num_blocks,
                        use_resize: bool, n: int) -> Optional[int]:
    """Pre-gate for routing: can ``VNetDS._flat_forward`` run depth-
    sharded over ``n`` devices at this image size? Returns the image
    axis to use as the flat plane-major axis (the one whose schedule
    shards the most levels — level 0 at minimum), or ``None`` if no
    axis supports it. Deeper non-dividing levels fall back to
    replicated compute on their own."""
    if n <= 1 or len(image_size) != 3:
        return None
    if any(int(b) < 1 for b in num_blocks):
        return None  # degenerate 0-block sections: module path
    best_dim, best_count = None, 0
    for dim in range(3):
        d_img = int(image_size[dim])
        # conv_in (k=2/s=2, padding 1) halves to d//2 + 1
        d0 = d_img // 2 + 1 if use_resize else d_img
        sched = shard_schedule(d0, len(num_blocks), n)
        if sched[0] and sum(sched) > best_count:
            best_dim, best_count = dim, sum(sched)
    return best_dim


def make_flat_sharded_apply(model, mesh, axis: str = SPATIAL_AXIS,
                            dim: int = 0):
    """``shard_map`` wrapper: params AND the channel-first input volume
    replicated (the entry conv_in's padding-1 stride-2 windows straddle
    any depth split, and the raw ``in_channels`` volume is the network's
    smallest tensor — each device slices its local slab right after the
    entry), output replicated (the flat tail all-gathers the small
    ``out_channels`` volume before the resize). The big internal tensors
    (``filters`` .. ``16*filters`` channels) are the ones sharded.

    The returned callable replaces ``model.apply`` in the train/predict
    steps (same ``(variables, x) -> y`` signature, jit-compatible).
    """
    n = int(mesh.shape[axis])
    smodel = (model if getattr(model, "spatial_shard", None)
              else model.clone(spatial_shard=(axis, n, dim)))

    def fwd(variables, x_rep):
        return smodel.apply(variables, x_rep)

    return shard_map(fwd, mesh=mesh, in_specs=(P(), P()),
                     out_specs=P(), check_vma=False)


def maybe_flat_sharded_apply(model, mesh, image_size, batch_size=1):
    """Routing helper for the train/test engines: the depth-sharded flat
    apply when ``model`` is a ``VNetDS`` whose flat path supports the
    mesh's spatial axis at ``image_size`` (``flat_vnet_shardable``), else
    ``None`` (caller falls back to the module path / single device)."""
    from ..models.architectures import VNetDS
    n_sp = mesh.shape.get(SPATIAL_AXIS, 1)
    if (n_sp <= 1 or batch_size != 1 or not isinstance(model, VNetDS)
            or not getattr(model, "use_pallas", False)):
        return None
    if (model.ndim != 5 or model.kernel_size != 3
            or not model.channel_first_io):
        return None
    dim = flat_vnet_shardable(tuple(image_size), model.num_blocks,
                              model.use_resize, n_sp)
    if dim is None:
        return None
    return make_flat_sharded_apply(model, mesh, dim=dim)
