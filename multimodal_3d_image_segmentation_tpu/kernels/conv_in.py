"""Pallas TPU kernel: fused input-downsampling convolution (k=2, s=2).

The learnable 2x input resize (reference ``nets/nets_utils.py:150-163``
ConvNormAct with kernel 2, stride 2, padding 1) is the single most
expensive op of the spectral models at full resolution: XLA's 3D conv with
C_in=4 runs ~6x over the memory bound (see docs/DESIGN.md). This kernel
computes the conv + bias + SELU as pure VPU multiply-accumulates over VMEM
tiles, reading the *channel-first* input (dense, no lane padding).

Strategy (every op individually validated against this Mosaic version —
strided loads and lane-dim reshapes are unsupported):
  * XLA side: pad so every stride-2 window is an aligned pair, free-reshape
    the W pairs, and transpose the within-pair index (dw) to the front;
  * kernel: reshape-split the D/H axes (major/sublane splits are exact) and
    statically index the (dw, dz, dy) phases; accumulate
    ``acc += x_phase[c] * W[dz,dy,dw,c,:]`` with lane-broadcast weights;
  * output tiles are (dt, ht, F, W2); a cheap XLA transpose restores
    channels-last.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import selu as _selu

__all__ = ["conv_in_s2d"]


def _kernel(x_ref, w_ref, b_ref, o_ref, *, apply_selu=True):
    # x: (2, C, 2dt, 2ht, W2) ; w: (4, 2, C, F) ; o: (dt, ht, F, W2)
    two, c, dt2, ht2, w2 = x_ref.shape
    dt, ht, f, _ = o_ref.shape
    xr = x_ref[:].reshape(2, c, dt, 2, ht, 2, w2)
    acc = jnp.zeros((dt, ht, f, w2), jnp.float32)
    k = 0
    for dz in range(2):
        for dy in range(2):
            for dw in range(2):
                for ci in range(c):
                    sub = xr[dw, ci, :, dz, :, dy, :]  # (dt, ht, W2)
                    wvec = w_ref[k, dw, ci]            # (F,)
                    acc = acc + (sub[:, :, None, :].astype(jnp.float32)
                                 * wvec[None, None, :, None]
                                 .astype(jnp.float32))
            k += 1
    out = acc + b_ref[:][None, None, :, None].astype(jnp.float32)
    if apply_selu:
        out = _selu(out)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dt", "ht", "interpret", "apply_selu"))
def _conv_in_impl(x_cf, kernel, bias, dt=11, ht=4, interpret=False,
                  apply_selu=True):
    b, c, d, h, w = x_cf.shape
    assert b == 1, "kernel handles batch 1; vmap for larger batches"
    f = kernel.shape[-1]
    d2, h2, w2 = d // 2 + 1, h // 2 + 1, w // 2 + 1

    x = jnp.pad(x_cf[0], ((0, 0), (1, 2 * d2 - d - 1), (1, 2 * h2 - h - 1),
                          (1, 2 * w2 - w - 1)))
    gd, gh = -(-d2 // dt), -(-h2 // ht)
    x = jnp.pad(x, ((0, 0), (0, 2 * (gd * dt - d2)),
                    (0, 2 * (gh * ht - h2)), (0, 0)))
    # W pairs minor-split (free) then dw to the front (one relayout)
    x = x.reshape(c, 2 * gd * dt, 2 * gh * ht, w2, 2)
    x = jnp.transpose(x, (4, 0, 1, 2, 3))  # (2, C, 2D2p, 2H2p, W2)

    wk = jnp.stack([jnp.stack([kernel[dz, dy, dw] for dw in range(2)])
                    for dz in range(2) for dy in range(2)])  # (4, 2, C, F)

    out = pl.pallas_call(
        functools.partial(_kernel, apply_selu=apply_selu),
        out_shape=jax.ShapeDtypeStruct((gd * dt, gh * ht, f, w2),
                                       x_cf.dtype),
        grid=(gd, gh),
        in_specs=[
            pl.BlockSpec((2, c, 2 * dt, 2 * ht, w2),
                         lambda i, j: (0, 0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2, c, f), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dt, ht, f, w2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wk, bias)
    # (D2, H2, F, W2) -> channels-last (1, D2, H2, W2, F)
    out = out[:d2, :h2]
    return jnp.transpose(out, (0, 1, 3, 2))[None]


def _build_w_select(w: int, w2: int) -> np.ndarray:
    """(2, w, w2) 0/1 matrices folding the W-axis stride-2 deinterleave,
    the -1 pad shift, AND the right-edge zero pad into one lane-dim dot:
    ``compact_kw[w2] = sum_l x[l] * M[kw, l, w2]`` == x'[2*w2 + kw] with
    x' the front-zero-padded row. Each column has at most one 1, so the
    dot is exact in any precision."""
    m = np.zeros((2, w, w2), np.float32)
    for kw in range(2):
        for o in range(w2):
            l = 2 * o + kw - 1
            if 0 <= l < w:
                m[kw, l, o] = 1.0
    return m


def _raw_kernel(main_ref, w_ref, b_ref, m_ref, o_ref, prev_ref, *,
                c, dt, d, h, w, w2, f, apply_selu=True,
                sel_precision="highest"):
    """Grid step i computes output depth rows [i*dt, (i+1)*dt) directly
    from the raw channel-first input: no XLA-side pad/reshape/transpose.

    Mosaic rejects DMA slices whose minor dims are not 128-aligned, so the
    -1 window shifts of the k=2/s=2/p=1 conv are realized without moving
    data at all:

      * D: even taps x[2z] live inside the tile's own (2dt)-row block;
        odd taps x[2z-1] are the block's odd rows shifted by one output
        row, with the tile's first odd tap carried across grid steps in
        persistent VMEM scratch ``prev_ref`` (TPU grids run sequentially,
        so step i-1's last block row is available without re-reading HBM).
      * H: even/odd taps come from an unshifted sublane split (h/2, 2);
        the +-1 output-row misalignment is repaired by zero-padding the
        two per-parity accumulators on opposite ends (pad on a major dim,
        cheap), which also realizes the H edge zero-padding.
      * W: folded into an exact 0/1 selection-matrix dot on the MXU
        (``_build_w_select``), which also realizes the W zero-padding.
    """
    i = pl.program_id(0)
    hh = h // 2
    main = main_ref[0]  # (C, 2dt, h, w)
    f32 = jnp.float32

    # The carried row is x[2*dt*i - 1] (compacted); at i == 0 it is the
    # x[-1] pad.
    @pl.when(i == 0)
    def _init_carry():
        prev_ref[:] = jnp.zeros(prev_ref.shape, prev_ref.dtype)

    # Even-D tap validity: row 2*(i*dt + t) < d fails only on the final
    # (one-real-row) tile, whose main block index map was clamped.
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, dt, 1, 1, 1), 1)
    mask_e = (2 * (i * dt + t_iota) < d).astype(f32)

    mainf = main.reshape(c * 2 * dt * h, w)
    parts = [None, None]  # per-ky (dt*hh, f, w2) accumulators
    for kw in range(2):
        # W compaction FIRST, as one full-block dot per tap (the dot
        # contracts only the lane dim, so it commutes with the D/H row
        # selections; 2 large dots beat 32 small per-phase ones).
        # Everything downstream works on w2 lanes.
        if mainf.dtype == jnp.bfloat16:
            # bf16 data: ONE native pass (the 0/1 selection matrix is
            # exact in bf16). Mosaic rejects HIGHEST ("Bad lhs type":
            # fp32 contract precision on bf16 operands), so this branch
            # is required, not just faster, under compute_dtype=bf16.
            comp = jax.lax.dot(mainf, m_ref[kw].astype(jnp.bfloat16),
                               preferred_element_type=f32)
        elif sel_precision == "bf16x2":
            # The selection matrix is 0/1 — exact in bf16; only the data
            # side splits (hi+lo carries 16 of fp32's 24 mantissa bits,
            # ~1e-5 relative — the serving precision class). 2 MXU passes
            # instead of HIGHEST's 6.
            mhi = mainf.astype(jnp.bfloat16)
            mlo = (mainf.astype(f32) - mhi.astype(f32)).astype(jnp.bfloat16)
            selb = m_ref[kw].astype(jnp.bfloat16)
            comp = (jax.lax.dot(mhi, selb, preferred_element_type=f32)
                    + jax.lax.dot(mlo, selb, preferred_element_type=f32))
        else:
            comp = jax.lax.dot(
                mainf, m_ref[kw].astype(mainf.dtype),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f32)  # (c*2dt*h, w2)
        cr = comp.reshape(c, dt, 2, hh, 2, w2)
        even_d = cr[:, :, 0] * mask_e              # (c, dt, hh, 2, w2)
        halo = prev_ref[kw][:, None]               # (c, 1, hh, 2, w2)
        if dt > 1:
            odd_d = jnp.concatenate(
                [halo, cr[:, : dt - 1, 1]], axis=1)
        else:
            odd_d = halo
        # Carry this block's compacted last row (read-before-write above).
        prev_ref[kw] = cr[:, dt - 1, 1]
        for kz, src in ((1, even_d), (0, odd_d)):
            for ky in range(2):
                # ky=1 -> even H rows src[...0.] (tap x[2y], y=0..hh-1);
                # ky=0 -> odd rows src[...1.] (tap x[2y-1], y=1..hh).
                ph = src[:, :, :, (ky + 1) % 2]    # (c, dt, hh, w2)
                for ci in range(c):
                    flat = ph[ci].reshape(dt * hh, w2)
                    wv = w_ref[kz * 2 + ky, kw, ci].astype(f32)  # (F,)
                    upd = flat[:, None, :] * wv[None, :, None]
                    parts[ky] = upd if parts[ky] is None else (parts[ky]
                                                               + upd)

    pe = parts[1].reshape(dt, hh, f, w2)
    po = parts[0].reshape(dt, hh, f, w2)
    acc = (jnp.pad(pe, ((0, 0), (0, 1), (0, 0), (0, 0)))
           + jnp.pad(po, ((0, 0), (1, 0), (0, 0), (0, 0))))
    # cast BEFORE inserting the minor dim: Mosaic only supports
    # non-no-op minor-dim insertion for 32-bit types (bf16 bias crashed)
    out = acc + b_ref[:].astype(f32)[None, None, :, None]
    if apply_selu:
        out = _selu(out)
    o_ref[:] = out.astype(o_ref.dtype)


def raw_path_supported(shape) -> bool:
    """The zero-prep kernel needs even D/H and batch 1 (W is free)."""
    b, c, d, h, w = shape
    return b == 1 and d % 2 == 0 and h % 2 == 0 and d >= 4 and h >= 2


def _pick_dt(c, d, h, w, itemsize, f=24):
    """Largest depth-tile dividing d/2 whose input block stays <= ~1.5 MB
    (blocks are double-buffered by the pipeline; VMEM is ~16 MB) AND whose
    unrolled kernel body fits Mosaic's 100 MB scoped-vmem stack.

    The stack estimate is ~linear in the tile's fp32 intermediate rows:
    32 per-(kw,kz,ky,ci) tail updates of (dt*hh, f, w2) plus the per-kw
    even/odd (c, dt, hh, 2, w2) copies. Calibrated on the one observed
    blow-up — bf16 @ (1,4,120,120,78) picked dt=10 and Mosaic asked for
    123.9 MB (units = dt*hh*w2 = 24k, f=24, c=4 -> ~5.2 kB/unit); the
    measured-good bench tiling (bf16 @ 240x240x155, dt=2, units 18.7k)
    stays legal under the 98 MB budget."""
    hh, w2 = h // 2, w // 2 + 1
    best = 1
    for dt in range(1, d // 2 + 1):
        if (d // 2) % dt:
            continue
        if 2 * dt * c * h * w * itemsize > 1.5e6:
            continue
        scoped_est = dt * hh * w2 * (32 * f + 24 * c) * 6
        if scoped_est > 98e6:
            continue
        best = dt
    return best


@functools.partial(jax.jit,
                   static_argnames=("interpret", "dt", "channels_middle",
                                    "apply_selu", "sel_precision"))
def _conv_in_raw_impl(x_cf, kernel, bias, interpret=False, dt=None,
                      channels_middle=False, apply_selu=True,
                      sel_precision="highest"):
    """conv_in straight off the raw channel-first HBM tensor: the ~3 ms of
    XLA-side pad + relayout passes of ``_conv_in_impl`` (docs/DESIGN.md
    section 3) do not exist on this path."""
    b, c, d, h, w = x_cf.shape
    assert raw_path_supported(x_cf.shape)
    f = kernel.shape[-1]
    d2, h2, w2 = d // 2 + 1, h // 2 + 1, w // 2 + 1
    hh_ = h // 2
    if dt is None:
        dt = _pick_dt(c, d, h, w, x_cf.dtype.itemsize, f=f)
    gm = d // (2 * dt)   # number of distinct main blocks
    grid = gm + 1        # final tile re-reads a clamped block (masked)

    wk = jnp.stack([jnp.stack([kernel[dz, dy, dw] for dw in range(2)])
                    for dz in range(2) for dy in range(2)])  # (4, 2, C, F)
    msel = np.asarray(_build_w_select(w, w2))  # numpy const

    kern = functools.partial(_raw_kernel, c=c, dt=dt, d=d, h=h,
                             w=w, w2=w2, f=f, apply_selu=apply_selu,
                             sel_precision=sel_precision)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((grid * dt, h2, f, w2), x_cf.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, c, 2 * dt, h, w),
                         lambda i: (0, 0, jnp.minimum(i, gm - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2, c, f), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, w, w2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dt, h2, f, w2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c, hh_, 2, w2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_cf, wk, bias, msel)
    out = out[:d2]
    if channels_middle:
        return out[None]  # (1, D2, H2, F, W2): the kernel's native layout
    return jnp.transpose(out, (0, 1, 3, 2))[None]


def _reference_xla(x_cf, kernel, bias, apply_selu=True):
    """XLA reference implementation (also supplies the backward pass)."""
    y = jax.lax.conv_general_dilated(
        jnp.transpose(x_cf, (0, 2, 3, 4, 1)), kernel, (2, 2, 2),
        [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)
    y = y + bias
    return jax.nn.selu(y) if apply_selu else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _conv_in_vjp(x_cf, kernel, bias, interpret, channels_middle,
                 apply_selu, sel_precision):
    if raw_path_supported(x_cf.shape):
        return _conv_in_raw_impl(x_cf, kernel, bias, interpret=interpret,
                                 channels_middle=channels_middle,
                                 apply_selu=apply_selu,
                                 sel_precision=sel_precision)
    d2 = x_cf.shape[2] // 2 + 1
    dt = min(11, d2)
    out = _conv_in_impl(x_cf, kernel, bias, dt=dt, ht=4,
                        interpret=interpret, apply_selu=apply_selu)
    if channels_middle:
        return jnp.transpose(out, (0, 1, 2, 4, 3))
    return out


def _conv_in_fwd(x_cf, kernel, bias, interpret, channels_middle,
                 apply_selu, sel_precision):
    return (_conv_in_vjp(x_cf, kernel, bias, interpret, channels_middle,
                         apply_selu, sel_precision),
            (x_cf, kernel, bias))


def _conv_in_bwd(interpret, channels_middle, apply_selu, sel_precision,
                 res, g):
    # Gradients via the (numerically matching) XLA formulation; the Pallas
    # kernel is only the forward fast path.
    x_cf, kernel, bias = res
    if channels_middle:
        g = jnp.transpose(g, (0, 1, 2, 4, 3))
    _, vjp = jax.vjp(
        lambda a, k, b: _reference_xla(a, k, b, apply_selu), x_cf, kernel,
        bias)
    return vjp(g)


_conv_in_vjp.defvjp(_conv_in_fwd, _conv_in_bwd)


def conv_in_s2d(x_cf: jax.Array, kernel: jax.Array, bias: jax.Array,
                interpret=None, channels_middle: bool = False,
                apply_selu: bool = True) -> jax.Array:
    """Fused k=2/s=2/pad=1 conv + bias (+ SELU unless ``apply_selu`` is
    False — V-Net-DS applies GroupNorm+ELU outside instead).

    The W-selection MXU precision follows the framework-wide fp32
    transform-precision knob: 'highest' -> exact (bf16x6) selection,
    'high' (the serving config) -> bf16x2 (the 0/1 selection matrix is
    exact in bf16; the data side splits hi/lo, ~1e-5 relative).

    Args:
        x_cf: channel-first input (1, C, D, H, W).
        kernel: (2, 2, 2, C, F) conv kernel (flax DHWIO layout).
        bias: (F,).
        channels_middle: return (1, D2, H2, F, W2) -- the Pallas kernel's
            native output layout -- instead of channels-last. This skips a
            full relayout pass (~1.3 ms at flagship shapes); the consumer
            (a 1x1 conv einsum) folds the layout change into its matmul.

    Returns:
        Channels-last (1, D//2+1, H//2+1, W//2+1, F) by default, matching
        ``ConvNormAct(F, kernel_size=2, strides=2)`` + SELU exactly.
        Differentiable (custom VJP; backward runs through XLA).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from ..ops import spectral
    sel_precision = ("bf16x2"
                     if spectral.PRECISION == jax.lax.Precision.HIGH
                     else "highest")
    return _conv_in_vjp(x_cf, kernel, bias, bool(interpret),
                        bool(channels_middle), bool(apply_selu),
                        sel_precision)
