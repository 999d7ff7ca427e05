"""Pallas TPU kernels: flat-layout 3D k=3 convolutions for small channels.

V-Net-DS's conv sections run at a few percent of MXU peak through XLA
(channel counts 24-96 on every matmul dim of a conv lowering) and its
channels-last elementwise passes pay ~13x over the memory bound (lane
tiles pad C -> 128; see docs/DESIGN.md §3d). These kernels operate on a
**flat padded layout** that fixes both:

    x_flat: (Dp, C, Npl)   Dp = D + 2 (one zero plane each side),
                           Npl = pad128(Hp * Wp), Hp/Wp = H/W + 2,
                           plane flattened row-major onto the LANE axis.

  * the 9 in-plane taps of a k=3 stencil are exact lane rolls of the
    padded plane (wrap effects land only at positions outside the valid
    interior);
  * one MXU dot per source plane computes all 3 depth taps at once:
        P[(kd*co), j] = W[(kd*co), (t*ci)] @ Xcol[(t*ci), j]
    with contraction 9*ci and M-dim 3*co — ~50% MXU utilization at C=24
    vs ~3.5% for the XLA lowering;
  * the three depth contributions of each output plane are accumulated
    across sequential grid steps in a two-register pending pipeline, so
    every input plane is read once and every output plane written once.

Borders: kernels SANITIZE their input (valid-interior lane mask + zero
D-flag per plane), so tensors between ops may carry dirty borders (e.g.
after GroupNorm's shift); outputs are emitted with CLEAN zero borders,
which keeps whole-array reductions equal to valid-voxel reductions (the
GroupNorm stats trick in ``models/architectures.py``).

An optional per-channel affine+activation **prologue** lets the previous
layer's GroupNorm normalize+activation fuse into this kernel's input
stage (zero extra HBM passes).

fp32 matmul precision inside kernels is bf16x3 via a manual hi/lo split
(Mosaic rejects ``Precision.HIGH``; ~5e-6 relative — comparable to XLA's
default conv precision, far better than its bf16 multiplies) or HIGHEST.
Backward passes run through the XLA formulation via custom VJP.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.flatvol import FlatGeom, flat_geom, from_flat, to_flat
from ._common import elu as _elu, hi_lo as _split_bf16, selu as _selu

__all__ = ["FlatGeom", "flat_geom", "to_flat", "from_flat", "conv3_flat",
           "apply_affine_act_flat"]


def _act_fn(name):
    if name is None or name == "none":
        return None
    if name == "elu":
        return _elu
    if name == "selu":
        return _selu
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    raise ValueError(f"unsupported kernel activation: {name!r}")


def _dot_f32(a, b, precision):
    dims = (((1,), (0,)), ((), ()))
    if precision == "native":
        # bf16 activations: ONE MXU pass (fp32 accumulation). The hi/lo
        # split terms would be exactly zero for bf16-representable data
        # — 2 of bf16x3's 3 passes compute nothing there.
        return lax.dot_general(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16), dims,
                               preferred_element_type=jnp.float32)
    if precision == "mixed":
        # bf16 activations + fp32-class WEIGHTS ('mixed' serving,
        # ops/spectral.set_bf16_exact): the weight (lhs) is hi/lo split
        # (2 MXU passes), the bf16-storage activation rounds once —
        # weight rounding eliminated at bf16 traffic. MXU passes are not
        # the bottleneck here (the kernel is DMA-bound).
        ahi, alo = _split_bf16(a.astype(jnp.float32))
        b16 = b.astype(jnp.bfloat16)
        return (lax.dot_general(ahi, b16, dims,
                                preferred_element_type=jnp.float32)
                + lax.dot_general(alo, b16, dims,
                                  preferred_element_type=jnp.float32))
    if precision == "bf16x3":
        ahi, alo = _split_bf16(a)
        bhi, blo = _split_bf16(b)
        return (lax.dot_general(ahi, bhi, dims,
                                preferred_element_type=jnp.float32)
                + lax.dot_general(ahi, blo, dims,
                                  preferred_element_type=jnp.float32)
                + lax.dot_general(alo, bhi, dims,
                                  preferred_element_type=jnp.float32))
    return lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _conv3_kernel(x_ref, x2_ref, w_ref, b_ref, m_ref, pro_ref, *rest_args,
                  ci, co, wp, npl, dp, precision, prologue_act, has_pro,
                  dilated_depth, has_x2, emit_stats, res_co, halo=False):
    # positional layout: [wr, br if res_co] [keep if halo] o
    #                    [r if res_co]
    #                    [s if emit_stats] [rs if res_co and emit_stats]
    #                    a bpend xcol
    rest = list(rest_args)
    wr_ref = br_ref = r_ref = rs_ref = s_ref = keep_ref = None
    if res_co:
        wr_ref, br_ref = rest.pop(0), rest.pop(0)  # trailing inputs
    if halo:
        keep_ref = rest.pop(0)                     # SMEM (2,) keep pair
    o_ref = rest.pop(0)
    if res_co:
        r_ref = rest.pop(0)
    if emit_stats:
        s_ref = rest.pop(0)
        if res_co:
            rs_ref = rest.pop(0)
    a_ref, bpend_ref, xcol_ref = rest
    i = pl.program_id(0)
    f32 = jnp.float32

    # --- input sanitize (+ fused prologue of the previous layer) ---
    xplane = x_ref[0].astype(f32)                  # (c1, Npl)
    if has_x2:
        # virtual channel concat: the second tensor's plane is stacked on
        # the sublane axis in VMEM — the HBM concat never exists
        xplane = jnp.concatenate([xplane, x2_ref[0].astype(f32)], axis=0)
    if has_pro:
        scale = pro_ref[0][:, :1]                  # (ci, 1)
        shift = pro_ref[1][:, :1]
        xplane = xplane * scale + shift
        act = _act_fn(prologue_act)
        if act is not None:
            xplane = act(xplane)
    interior = ((i > 0) & (i < dp - 1)).astype(f32)
    if dilated_depth is None:
        # halo mode (spatial sharding): the border planes hold REAL
        # neighbor data exchanged via ppermute, not zero pads — keep
        # them (lane-masked only) so they feed the first/last valid
        # output planes; the duplicate clipped fetch at grid step dp
        # only reaches the write_zero'd border output and dead scratch.
        # At the GLOBAL volume ends the wrapper sends zero halos that a
        # prologue would turn into act(shift): the SMEM keep pair
        # re-zeroes them post-prologue (exact zero-pad semantics).
        if halo:
            dflag = jnp.where(i == 0, keep_ref[0],
                              jnp.where(i >= dp - 1, keep_ref[1], 1.0))
        else:
            dflag = interior
    else:
        # D-dilated input (transposed convs): interior position q = i-1
        # holds source plane q//2 iff q is even and q//2 < dilated_depth;
        # the fetched (clipped) plane is zeroed otherwise.
        q = i - 1
        dflag = ((i > 0) & (i < dp - 1) & (q % 2 == 0)
                 & (q // 2 < dilated_depth)).astype(f32)
    xplane = xplane * (m_ref[:] * dflag)           # zero borders + D pads

    if res_co:
        # pointwise residual tap of the (sanitized) chain input: the
        # parallel 1x1 residual conv reads the concat pair for free here
        # instead of re-reading it from HBM (res taps are gated to
        # prologue-free calls, so xplane IS the raw chain input)
        # (in halo mode the tap stays interior-only: halo planes
        # duplicate neighbor planes and must not enter r or its stats)
        r = _dot_f32(wr_ref[:], xplane, precision)     # (res_co, Npl)
        r = (r + br_ref[:][:, :1]) * (m_ref[:] * interior)
        r_ref[0] = r.astype(r_ref.dtype)
        if rs_ref is not None:
            rf = r.reshape(res_co, npl // 128, 128)
            rs_ref[0, 0] = jnp.sum(rf, axis=1)
            rs_ref[0, 1] = jnp.sum(rf * rf, axis=1)

    for t in range(9):
        kh, kw = divmod(t, 3)
        off = (kh - 1) * wp + (kw - 1)
        xcol_ref[t * ci:(t + 1) * ci, :] = pltpu.roll(xplane,
                                                      (-off) % npl, 1)
    p = _dot_f32(w_ref[:], xcol_ref[:], precision)  # (3co, Npl)

    # --- pending-plane pipeline: out_padded[i-1] completes at step i ---
    done = bpend_ref[:] + p[2 * co:3 * co]
    done = (done + b_ref[:][:, :1]) * m_ref[:]      # bias + clean borders
    write_zero = (i <= 1) | (i >= dp)
    done = jnp.where(write_zero, 0.0, done)
    o_ref[0] = done.astype(o_ref.dtype)
    if s_ref is not None:
        # per-channel GroupNorm moment partials of the plane just
        # written (borders are exact zeros -> whole-row sums are valid-
        # interior sums); reduced over grid steps in XLA. Lane-folded to
        # (co, 128) so the write stays a clean vector op.
        df = done.reshape(co, npl // 128, 128)
        s_ref[0, 0] = jnp.sum(df, axis=1)
        s_ref[0, 1] = jnp.sum(df * df, axis=1)
    bpend_ref[:] = a_ref[:] + p[co:2 * co]
    a_ref[:] = p[0:co]


@functools.partial(
    jax.jit, static_argnames=("g", "precision", "prologue_act", "interpret",
                              "dilated_depth", "emit_stats", "halo"))
def _conv3_flat_impl(x_flat, x2, w72, bias, mask, prologue, g, precision,
                     prologue_act, interpret, dilated_depth=None,
                     emit_stats=False, res_kernel=None, res_bias=None,
                     halo=False, halo_keep=None):
    has_x2 = x2 is not None
    ci = x_flat.shape[1] + (x2.shape[1] if has_x2 else 0)
    co = w72.shape[0] // 3
    res_co = 0 if res_kernel is None else res_kernel.shape[0]
    has_pro = prologue is not None
    # bias as (co, 128) lane-broadcast row (scalar operands need 2D VMEM)
    bias2 = jnp.broadcast_to(bias[:, None], (co, 128))

    if dilated_depth is None:
        n_src = g.dp
        x_index = lambda i: (jnp.minimum(i, n_src - 1), 0, 0)
    else:
        # x_flat holds only the source planes (dilated_depth + 2 pads);
        # interior position q = i-1 reads source plane q//2 + 1
        n_src = x_flat.shape[0]
        x_index = lambda i: (jnp.clip((i - 1) // 2 + 1, 0, n_src - 1),
                             0, 0)
    if has_x2:
        operands = [x_flat, x2, w72, bias2, mask]
        x2_spec = pl.BlockSpec((1, x2.shape[1], g.npl), x_index,
                               memory_space=pltpu.VMEM)
    else:
        operands = [x_flat, jnp.zeros((1, 8, 128), x_flat.dtype), w72,
                    bias2, mask]
        x2_spec = pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, x_flat.shape[1], g.npl), x_index,
                     memory_space=pltpu.VMEM),
        x2_spec,
        pl.BlockSpec((3 * co, 9 * ci), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((co, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g.npl), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if has_pro:
        pro = jnp.stack([jnp.broadcast_to(prologue[0][:, None], (ci, 128)),
                         jnp.broadcast_to(prologue[1][:, None], (ci, 128))])
        operands.append(pro)
        in_specs.append(pl.BlockSpec((2, ci, 128), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    else:
        operands.append(jnp.zeros((2, 8, 128), x_flat.dtype))
        in_specs.append(pl.BlockSpec((2, 8, 128), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if res_co:
        operands.append(res_kernel)
        in_specs.append(pl.BlockSpec((res_co, ci), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.broadcast_to(
            res_bias.astype(jnp.float32)[:, None], (res_co, 128)))
        in_specs.append(pl.BlockSpec((res_co, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if halo:
        keep = (jnp.ones((2,), jnp.float32) if halo_keep is None
                else halo_keep.astype(jnp.float32))
        operands.append(keep)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    kern = functools.partial(
        _conv3_kernel, ci=ci, co=co, wp=g.wp, npl=g.npl, dp=g.dp,
        precision=precision, prologue_act=prologue_act, has_pro=has_pro,
        dilated_depth=dilated_depth, has_x2=has_x2, emit_stats=emit_stats,
        res_co=res_co, halo=halo)
    out_shape = [jax.ShapeDtypeStruct((g.dp, co, g.npl), x_flat.dtype)]
    out_specs = [pl.BlockSpec(
        (1, co, g.npl),
        lambda i: (jnp.clip(i - 1, 0, g.dp - 1), 0, 0),
        memory_space=pltpu.VMEM)]
    if res_co:
        # the residual tap of INPUT plane i completes at step i (no
        # pending pipeline); the extra step dp re-writes border plane
        # dp-1 with the same exact zeros (idempotent)
        out_shape.append(jax.ShapeDtypeStruct((g.dp, res_co, g.npl),
                                              x_flat.dtype))
        out_specs.append(pl.BlockSpec(
            (1, res_co, g.npl),
            lambda i: (jnp.minimum(i, g.dp - 1), 0, 0),
            memory_space=pltpu.VMEM))
    if emit_stats:
        # per-step (sum, sumsq) lane partials; tiny (grid, 2, co, 128)
        out_shape.append(jax.ShapeDtypeStruct((g.dp + 1, 2, co, 128),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, 2, co, 128),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        if res_co:
            out_shape.append(jax.ShapeDtypeStruct(
                (g.dp + 1, 2, res_co, 128), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 2, res_co, 128),
                                          lambda i: (i, 0, 0, 0),
                                          memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(g.dp + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((co, g.npl), jnp.float32),
                        pltpu.VMEM((co, g.npl), jnp.float32),
                        pltpu.VMEM((9 * ci, g.npl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    out = list(out)
    y = out.pop(0)
    r = out.pop(0) if res_co else None
    if emit_stats:
        stats = jnp.sum(out.pop(0), axis=(0, 3))   # (2, co)
        if res_co:
            return y, r, stats, jnp.sum(out.pop(0), axis=(0, 3))
        return y, stats
    if res_co:
        return y, r
    return y


def _conv3_xla_reference(x_flat, kernel, bias, prologue, g, prologue_act,
                         x2=None, emit_stats=False, res=None, halo=False,
                         halo_keep=None):
    """XLA formulation on the unflattened view — numerics oracle and the
    backward pass of the custom VJP. ``res``: optional (res_kernel
    (res_co, ci), res_bias) pointwise tap of the pre-prologue input.
    ``halo``: the flat tensor's border planes are real neighbor data —
    convolve over D+2 depth and keep the interior D output planes."""
    if x2 is not None:
        x_flat = jnp.concatenate([x_flat, x2], axis=1)
    if halo:
        # view the halo planes as two extra valid depth slices, run the
        # same SAME-conv, then drop the (wrong-at-zero-pad) outer planes
        g_ext = flat_geom(g.d + 2, g.h, g.w)
        x4 = from_flat(jnp.pad(x_flat, ((1, 1), (0, 0), (0, 0))), g_ext)
        x4_loc = x4[:, 1:-1]                        # the local D planes
    else:
        x4 = from_flat(x_flat, g)                   # (C, D, H, W)
        x4_loc = x4
    outs = []
    if res is not None:
        assert prologue is None
        rk, rb = res
        r4 = jnp.einsum("ic,cdhw->idhw", rk.astype(x4.dtype), x4_loc,
                        precision=lax.Precision.HIGHEST) \
            + rb.astype(x4.dtype)[:, None, None, None]
        outs.append(to_flat(r4, g))
    if prologue is not None:
        scale, shift = prologue
        x4 = x4 * scale[:, None, None, None] + shift[:, None, None, None]
        act = {"elu": jax.nn.elu, "selu": jax.nn.selu,
               "relu": jax.nn.relu, None: None, "none": None}[prologue_act]
        if act is not None:
            x4 = act(x4)
    if halo:
        # zero-pad semantics at the GLOBAL volume ends: re-zero the halo
        # planes the keep pair marks invalid (post-prologue, like the
        # kernel's dflag)
        keep = (jnp.ones((2,), x4.dtype) if halo_keep is None
                else halo_keep.astype(x4.dtype))
        dmask = jnp.concatenate([keep[:1], jnp.ones((g.d,), x4.dtype),
                                 keep[1:]])
        x4 = x4 * dmask[None, :, None, None]
    y = lax.conv_general_dilated(
        x4[None], kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        precision=lax.Precision.HIGHEST)[0] + bias[:, None, None, None]
    if halo:
        y = y[:, 1:-1]  # outer planes saw zero pads where halos continue
    y_flat = to_flat(y, g)                          # clean zero borders
    outs.insert(0, y_flat)
    if emit_stats:
        def _st(t):
            tf = t.astype(jnp.float32)
            return jnp.stack([jnp.sum(tf, axis=(0, 2)),
                              jnp.sum(tf * tf, axis=(0, 2))])
        outs.append(_st(y_flat))
        if res is not None:
            outs.append(_st(outs[1]))
    return tuple(outs) if len(outs) > 1 else outs[0]


def _pack_w72(kernel):
    """(3,3,3,ci,co) -> (3*co, 9*ci): W72[(kd*co+o), (t*ci+i)]."""
    ci, co = kernel.shape[-2:]
    w = jnp.transpose(kernel.reshape(3, 9, ci, co), (0, 3, 1, 2))
    return w.reshape(3 * co, 9 * ci)


def _dilate_d_flat(x_flat, d_src):
    """XLA reference for the dilated-depth mode: materialize the D-dilated
    flat volume (interior[2j] = src interior[j], odd planes zero)."""
    planes = x_flat[1:d_src + 1]
    zeros = jnp.zeros_like(planes)
    inter = jnp.stack([planes, zeros], axis=1).reshape(
        2 * d_src, x_flat.shape[1], x_flat.shape[2])
    return jnp.pad(inter, ((1, 1), (0, 0), (0, 0)))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _conv3_vjp(x_flat, x2, kernel, bias, prologue, res_kernel, res_bias,
               halo_keep, g, precision, prologue_act, interpret,
               dilated_depth, emit_stats, halo):
    mask = np.asarray(g.interior_mask())  # numpy const: no device readback at lowering
    return _conv3_flat_impl(x_flat, x2, _pack_w72(kernel), bias, mask,
                            prologue, g, precision, prologue_act, interpret,
                            dilated_depth=dilated_depth,
                            emit_stats=emit_stats, res_kernel=res_kernel,
                            res_bias=res_bias, halo=halo,
                            halo_keep=halo_keep)


def _conv3_fwd(x_flat, x2, kernel, bias, prologue, res_kernel, res_bias,
               halo_keep, g, precision, prologue_act, interpret,
               dilated_depth, emit_stats, halo):
    out = _conv3_vjp(x_flat, x2, kernel, bias, prologue, res_kernel,
                     res_bias, halo_keep, g, precision, prologue_act,
                     interpret, dilated_depth, emit_stats, halo)
    return out, (x_flat, x2, kernel, bias, prologue, res_kernel, res_bias,
                 halo_keep)


def _conv3_bwd(g, precision, prologue_act, interpret, dilated_depth,
               emit_stats, halo, res, grad):
    *vals, halo_keep = res  # (x_flat, x2, kernel, bias, prologue, rk, rb)
    vals = list(vals)

    def f_full(xf, xs, k, b, pro, rk, rb):
        if dilated_depth is not None:
            # concat + prologue BEFORE dilation: the kernel zeroes the
            # inserted planes AFTER its prologue, so they are exact
            # zeros — applying the prologue to an already-dilated volume
            # would turn them into act(shift)
            if xs is not None:
                xf = jnp.concatenate([xf, xs], axis=1)
                xs = None
            if pro is not None:
                xf = apply_affine_act_flat(xf, pro[0], pro[1],
                                           prologue_act)
                pro = None
            xf = _dilate_d_flat(xf, dilated_depth)
        return _conv3_xla_reference(
            xf, k, b, pro, g, prologue_act, x2=xs, emit_stats=emit_stats,
            res=None if rk is None else (rk, rb), halo=halo,
            halo_keep=halo_keep)

    # differentiate w.r.t. the present (non-None) args only
    idx = [i for i, v in enumerate(vals) if v is not None]

    def f(*present):
        full = list(vals)
        for i, v in zip(idx, present):
            full[i] = v
        return f_full(*full)

    _, vjp = jax.vjp(f, *[vals[i] for i in idx])
    grads = vjp(grad)
    out = [None] * len(vals)
    for i, gv in zip(idx, grads):
        out[i] = gv
    return tuple(out) + (None,)  # halo_keep: non-differentiable 0/1 data


_conv3_vjp.defvjp(_conv3_fwd, _conv3_bwd)


def conv3_flat(x_flat, kernel: jax.Array, bias: jax.Array,
               g: FlatGeom, prologue: Optional[Tuple[jax.Array, jax.Array]]
               = None, prologue_act: Optional[str] = None,
               precision: str = "bf16x3",
               interpret: Optional[bool] = None,
               dilated_depth: Optional[int] = None,
               emit_stats: bool = False,
               residual: Optional[Tuple[jax.Array, jax.Array]] = None,
               halo: bool = False,
               halo_keep: Optional[jax.Array] = None):
    """k=3/s=1 SAME conv on the flat padded layout.

    Args:
        x_flat: (Dp, ci, Npl); borders may be dirty (sanitized in-kernel).
        kernel: (3, 3, 3, ci, co) DHWIO weights.
        bias: (co,).
        g: the FlatGeom of the volume.
        prologue: optional per-channel (scale, shift) applied to the input
            BEFORE the conv, followed by ``prologue_act`` — fuses the
            previous layer's GroupNorm+activation into this kernel.
        precision: 'bf16x3' (default for fp32 inputs; ~5e-6 rel),
            'highest' (bf16x6), or 'native' (one bf16 MXU pass with fp32
            accumulation — auto-selected for bf16 inputs, matching the
            module path's bf16 precision class and the sibling kernels).
        emit_stats: also return fp32 per-channel GroupNorm moment sums
            ``(2, co)`` = [sum(y), sum(y^2)] over the valid interior,
            accumulated inside the kernel — the following GroupNorm
            needs no stats read pass over the volume.
        residual: optional (res_kernel (res_co, ci), res_bias (res_co,))
            pointwise tap of the (pre-prologue) input: also emit
            ``r = res_kernel @ x + res_bias`` — the parallel 1x1
            residual conv of V-Net's sections reads the input for free
            here instead of re-reading it from HBM. Requires
            ``prologue is None`` and no ``dilated_depth``.
        halo: the border planes of ``x_flat`` hold REAL neighbor data
            (depth-axis spatial sharding: one-plane halo exchange per
            conv — ``parallel/halo.py``) instead of zero pads. They
            feed the first/last valid output planes; output borders
            and the residual tap stay interior-only, and ``emit_stats``
            sums stay local-interior (psum them across the shard axis
            for global GroupNorm moments). Incompatible with
            ``dilated_depth``.
        halo_keep: (2,) 0/1 floats — validity of the first/last halo
            plane. The global-end shards receive zero halos that a
            prologue would turn into ``act(shift)``; passing 0 there
            re-zeroes them post-prologue (exact SAME-conv zero pads).
            Default: both valid.

    Returns:
        (Dp, co, Npl) with clean zero borders (bias applied inside the
        valid interior only); with ``residual`` also r (Dp, res_co,
        Npl); with ``emit_stats`` also the (2, co) stats (and the
        (2, res_co) residual stats when both). Differentiable
        (backward via XLA).
    """
    if isinstance(x_flat, (tuple, list)):
        x_flat, x2 = x_flat  # virtual channel concat (ci = c1 + c2)
    else:
        x2 = None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x_flat.dtype == jnp.bfloat16 and precision == "bf16x3":
        from ..ops.spectral import BF16_EXACT
        precision = "mixed" if BF16_EXACT else "native"
    if residual is not None:
        if prologue is not None or dilated_depth is not None:
            # the VJP reference taps the PRE-prologue input; a prologue
            # here would silently desync forward and gradient
            raise ValueError("conv3_flat(residual=...) requires "
                             "prologue=None and dilated_depth=None")
        from ..ops.spectral import _isl
        res_kernel = residual[0].astype(_isl(x_flat.dtype))
        res_bias = residual[1]
    else:
        res_kernel = res_bias = None
    if halo and dilated_depth is not None:
        raise ValueError("conv3_flat(halo=True) does not compose with "
                         "dilated_depth (transposed convs exchange "
                         "SOURCE planes before dilation)")
    hk = None
    if halo:
        hk = (jnp.ones((2,), jnp.float32) if halo_keep is None
              else jnp.asarray(halo_keep, jnp.float32))
    return _conv3_vjp(x_flat, x2, kernel, bias, prologue, res_kernel,
                      res_bias, hk, g, precision, prologue_act,
                      bool(interpret), dilated_depth, bool(emit_stats),
                      bool(halo))


def apply_affine_act_flat(x_flat, scale, shift, act: Optional[str]):
    """XLA-side per-channel affine + activation on a flat tensor (used
    when the consumer is not a kernel that could fuse it). Borders become
    dirty — fine, downstream kernels sanitize."""
    y = x_flat * scale[None, :, None] + shift[None, :, None]
    fn = {"elu": jax.nn.elu, "selu": jax.nn.selu, "relu": jax.nn.relu,
          None: None, "none": None}[act]
    return fn(y) if fn is not None else y
