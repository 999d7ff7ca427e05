"""Real-Mosaic smoke of ``conv3_flat``'s halo mode (spatial sharding).

The depth-sharded paths (``parallel/halo.py``, ``parallel/flat_sharded.py``)
are exact on the CPU virtual mesh, but interpret-passing Pallas patterns
can still fail to compile or miscompute on real Mosaic (see CLAUDE.md and
the v5 tower-kernel probe). The halo mode adds exactly two new kernel
ingredients — the SMEM (2,) keep-pair operand and the in-kernel border
re-zeroing selects — and both run fine single-device: this script emulates
each shard serially on the ONE real TPU chip (slab + neighbor halo planes
in the borders, per-shard keep pair) and checks

  * the composed shard outputs == the single-device global ``conv3_flat``
  * summed per-shard moment stats == global stats (the ``psum`` identity)
  * residual-tap and prologue(+act) halo variants
  * the transpose-conv shape (doubled output channels on the interleaved
    volume) that ``_FlatConvTransposeNormAct`` issues in sharded mode

All comparisons are Mosaic-vs-Mosaic with an XLA cross-check, fp32 at the
default bf16x3 precision class.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu.kernels.conv3d_flat import (
    conv3_flat)
from multimodal_3d_image_segmentation_tpu.ops.flatvol import (flat_geom,
                                                              to_flat)

fails = []


def _case(d=16, h=10, w=9, ci=6, co=5, seed=0):
    rng = np.random.default_rng(seed)
    x4 = jnp.asarray(rng.standard_normal((ci, d, h, w)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((3, 3, 3, ci, co)) * 0.2)
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    g = flat_geom(d, h, w)
    return x4, k, b, g, to_flat(x4, g)


def _shards(xf, g, n):
    """Emulate the halo exchange host-side: local (d_loc+2, C, Npl) slabs
    whose borders are the adjacent global planes (zeros at the ends)."""
    d_loc = g.d // n
    inter = xf[1:g.d + 1]
    padded = jnp.pad(inter, ((1, 1), (0, 0), (0, 0)))
    slabs, keeps = [], []
    for i in range(n):
        slabs.append(padded[i * d_loc:i * d_loc + d_loc + 2])
        keeps.append(jnp.asarray([float(i > 0), float(i < n - 1)],
                                 jnp.float32))
    return slabs, keeps, d_loc


def _compose(parts, g):
    inter = jnp.concatenate([p[1:-1] for p in parts], axis=0)
    assert inter.shape[0] == g.d
    return jnp.pad(inter, ((1, 1), (0, 0), (0, 0)))


def report(tag, got, want, tol=2e-5, relative=False):
    d = float(np.abs(np.asarray(got) - np.asarray(want)).max())
    if relative:
        # moment sums reassociate across shards: compare vs magnitude
        d /= max(float(np.abs(np.asarray(want)).max()), 1e-12)
    ok = d < tol
    kind = "reldiff" if relative else "maxdiff"
    print(f"{tag:46s} {kind} {d:.3e} {'OK' if ok else 'FAIL'}")
    if not ok:
        fails.append(tag)


def smoke_basic(n):
    x4, k, b, g, xf = _case()
    want, want_st = conv3_flat(xf, k, b, g, emit_stats=True)
    slabs, keeps, d_loc = _shards(xf, g, n)
    g_loc = flat_geom(d_loc, g.h, g.w)
    parts, stats = [], []
    for s, kp in zip(slabs, keeps):
        y, st = conv3_flat(s, k, b, g_loc, emit_stats=True, halo=True,
                           halo_keep=kp)
        parts.append(y)
        stats.append(st)
    report(f"halo n={n} fwd", _compose(parts, g), want)
    report(f"halo n={n} psum'd stats", sum(stats), want_st,
           tol=1e-5, relative=True)


def smoke_residual_prologue():
    x4, k, b, g, xf = _case(d=12)
    rng = np.random.default_rng(3)
    rk = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
    rb = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    want, want_r = conv3_flat(xf, k, b, g, residual=(rk, rb))
    slabs, keeps, d_loc = _shards(xf, g, 2)
    g_loc = flat_geom(d_loc, g.h, g.w)
    ys, rs = zip(*[conv3_flat(s, k, b, g_loc, residual=(rk, rb),
                              halo=True, halo_keep=kp)
                   for s, kp in zip(slabs, keeps)])
    report("halo residual main", _compose(list(ys), g), want)
    report("halo residual tap", _compose(list(rs), g), want_r)

    scale = jnp.asarray(rng.standard_normal((6,)).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal((6,)).astype(np.float32))
    want_p = conv3_flat(xf, k, b, g, prologue=(scale, shift),
                        prologue_act="elu")
    ps = [conv3_flat(s, k, b, g_loc, prologue=(scale, shift),
                     prologue_act="elu", halo=True, halo_keep=kp)
          for s, kp in zip(slabs, keeps)]
    report("halo prologue+elu", _compose(ps, g), want_p)


def smoke_transpose_shape():
    # _FlatConvTransposeNormAct's sharded call: interleaved (H,W) lanes,
    # doubled output channels, halo over the SOURCE planes
    x4, k, b, g, xf = _case(d=8, h=6, w=5, ci=5, co=4, seed=7)
    g2 = flat_geom(g.d, 2 * g.h, 2 * g.w)
    rng = np.random.default_rng(9)
    up = jnp.asarray(rng.standard_normal(
        (g.d + 2, 5, g2.npl)).astype(np.float32))
    k2 = jnp.asarray((rng.standard_normal((3, 3, 3, 5, 8)) * 0.2)
                     .astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    want, want_st = conv3_flat(up, k2, b2, g2, emit_stats=True)
    slabs, keeps, d_loc = _shards(up, g2, 2)
    g_loc = flat_geom(d_loc, g2.h, g2.w)
    parts, stats = [], []
    for s, kp in zip(slabs, keeps):
        y, st = conv3_flat(s, k2, b2, g_loc, emit_stats=True, halo=True,
                           halo_keep=kp)
        parts.append(y)
        stats.append(st)
    report("halo transpose-shape fwd", _compose(parts, g2), want)
    report("halo transpose-shape stats", sum(stats), want_st,
           tol=1e-5, relative=True)


def smoke_grad():
    # the custom VJP replays the XLA reference in halo mode — compile +
    # run it once on the chip
    x4, k, b, g, xf = _case(d=8)
    slabs, keeps, d_loc = _shards(xf, g, 2)
    g_loc = flat_geom(d_loc, g.h, g.w)

    def loss(args, s, kp):
        k_, b_ = args
        return jnp.sum(conv3_flat(s, k_, b_, g_loc, halo=True,
                                  halo_keep=kp) ** 2)

    def loss_global(args):
        k_, b_ = args
        return jnp.sum(conv3_flat(xf, k_, b_, g) ** 2)

    gk = [jax.jit(jax.grad(loss))((k, b), s, kp)
          for s, kp in zip(slabs, keeps)]
    want = jax.grad(loss_global)((k, b))
    got = jax.tree_util.tree_map(lambda *ts: sum(ts), *gk)
    for name, a, c in zip(("dk", "db"), want, got):
        report(f"halo grad {name} (summed shards)", c, a, tol=1e-4,
               relative=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for n in (2, 4):
        smoke_basic(n)
    smoke_residual_prologue()
    smoke_transpose_shape()
    smoke_grad()
    print("FAILS:", fails)
    assert not fails
    print("ALL OK")
