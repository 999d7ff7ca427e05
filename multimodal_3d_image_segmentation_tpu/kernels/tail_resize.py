"""Pallas TPU kernel: fused trilinear-upsample + softmax output tail.

Every model family ends the same way: 1x1 conv_out at the small internal
grid -> trilinear resize (align_corners=False, reference
``nets/hnosegxs.py:174-176``) -> center pad/crop (a no-op whenever the
resize targets the original image size) -> softmax over the channel axis
(reference ``nets/architectures.py:349-353``). As separate XLA passes
the chain costs ~5 HBM round-trips that double per resized axis, and the
softmax re-reads the full-resolution output (143 MB at the BraTS'23
bench shape) one more time — ~2.5-3 ms of pure traffic. Fused, the
mandatory traffic is ONE read of the small grid and ONE write of the
output (~0.8 ms at the bench shape).

Kernel layout: grid over OUTPUT depth planes.

  * D axis: two-tap interpolation selects the (lo, hi) source planes via
    two block index maps on the SAME input array — the fetch sequence is
    monotone, so the Pallas pipeline re-uses the resident block whenever
    the index repeats (each source plane is DMA'd ~twice, not once per
    consumer). The tap weight rides a whole-array SMEM operand indexed
    by ``program_id``; the interpolation itself is the exact fp32
    ``lo + w*(hi-lo)`` gather form.
  * H/W axes: two-tap interpolation matrices (``ops/resize.py``) applied
    as per-channel MXU dots at bf16x3 (fp32-class; Mosaic has no
    HIGH/HIGHEST precision inside kernel dots) with the matrix hi/lo
    splits precomputed host-side.
  * softmax runs on the fp32 per-channel accumulators in VMEM; the only
    store is the final probabilities.

Differentiable: custom VJP (forward = this kernel; backward = softmax
VJP + the transposed interpolation matmuls through XLA, matching the
module tail's gradients to fp rounding).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import hi_lo
from ..ops.resize import _linear_matrix_np

__all__ = ["fused_tail_softmax", "maybe_fused_tail", "tail_supported"]

_MAX_CHANNELS = 8          # per-channel unroll bound (out_channels is 2-4)
_MAX_BLOCK_BYTES = 6 << 20  # in+out VMEM block budget (double-buffered)


# ---------------------------------------------------------------- D taps

def _d_taps_np(n_in: int, n_out: int) -> Tuple[np.ndarray, np.ndarray]:
    """(lo_idx, hi_weight) per output plane, integer-exact floor.

    ``lo`` uses exact integer arithmetic — floor((2z+1)*n_in/(2*n_out)
    - 1/2) via floor division — so it provably matches the arithmetic the
    block index map evaluates on device. The weight is then measured
    against THAT lo from the float64 clipped source coordinate (as in
    ``ops/resize._linear_taps_np``); any ulp-level floor disagreement at
    an exact-integer source lands as w in {0, 1} and changes the value by
    <= 1 ulp (linear interpolation is continuous across tap switches)."""
    dst = np.arange(n_out)
    lo = (((2 * dst + 1) * n_in - n_out) // (2 * n_out))
    lo = np.clip(lo, 0, n_in - 1).astype(np.int64)
    src = np.clip((dst + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1)
    w = np.clip(src - lo, 0.0, 1.0).astype(np.float32)
    return lo, w


def _lo_idx(i, n_in: int, n_out: int):
    """The index-map twin of ``_d_taps_np``'s lo (traced int32 scalar)."""
    raw = ((2 * i + 1) * n_in - n_out) // (2 * n_out)
    return jnp.clip(raw, 0, n_in - 1)


# ----------------------------------------------------------------- kernel

def _tail_kernel(lo_ref, hi_ref, wd_ref, mh_hi_ref, mh_lo_ref,
                 mw_hi_ref, mw_lo_ref, o_ref, *, c):
    i = pl.program_id(0)
    f32 = jnp.float32
    wd = wd_ref[i]

    def resized(ci):
        lo = lo_ref[0, ci, 0].astype(f32)          # (h_in, w_in)
        hi = hi_ref[0, ci, 0].astype(f32)
        p = lo + wd * (hi - lo)                    # exact two-tap D interp
        # H: (h_out, h_in) @ (h_in, w_in), bf16x3 (drop lo*lo)
        ph, plo = hi_lo(p)
        y = (jax.lax.dot(mh_hi_ref[:], ph, preferred_element_type=f32)
             + jax.lax.dot(mh_hi_ref[:], plo, preferred_element_type=f32)
             + jax.lax.dot(mh_lo_ref[:], ph, preferred_element_type=f32))
        # W: (h_out, w_in) @ (w_in, w_out)
        yh, yl = hi_lo(y)
        return (jax.lax.dot(yh, mw_hi_ref[:], preferred_element_type=f32)
                + jax.lax.dot(yl, mw_hi_ref[:], preferred_element_type=f32)
                + jax.lax.dot(yh, mw_lo_ref[:], preferred_element_type=f32))

    chans = [resized(ci) for ci in range(c)]
    m = chans[0]
    for z in chans[1:]:
        m = jnp.maximum(m, z)
    es = [jnp.exp(z - m) for z in chans]
    s = es[0]
    for e in es[1:]:
        s = s + e
    inv = 1.0 / s
    for ci in range(c):
        o_ref[0, ci, 0] = (es[ci] * inv).astype(o_ref.dtype)


def _split_np(m: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """fp32 -> (bf16 hi, bf16 lo) numpy consts (host-side, trace-safe)."""
    import ml_dtypes
    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("sizes", "out_dtype",
                                             "interpret"))
def _tail_impl(x_cf, sizes, out_dtype, interpret):
    b, c, d_in, h_in, w_in = x_cf.shape
    d_out, h_out, w_out = sizes

    mh = _linear_matrix_np(h_in, h_out).T          # (h_out, h_in)
    mw = _linear_matrix_np(w_in, w_out)            # (w_in, w_out)
    mh_hi, mh_lo = _split_np(mh)
    mw_hi, mw_lo = _split_np(mw)
    _, wd = _d_taps_np(d_in, d_out)

    plane = pl.BlockSpec((1, c, 1, h_in, w_in),
                         lambda i: (0, 0, _lo_idx(i, d_in, d_out), 0, 0),
                         memory_space=pltpu.VMEM)
    plane_hi = pl.BlockSpec(
        (1, c, 1, h_in, w_in),
        lambda i: (0, 0, jnp.minimum(_lo_idx(i, d_in, d_out) + 1,
                                     d_in - 1), 0, 0),
        memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_tail_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct((1, c, d_out, h_out, w_out),
                                       out_dtype),
        grid=(d_out,),
        in_specs=[
            plane, plane_hi,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            whole(mh_hi.shape), whole(mh_lo.shape),
            whole(mw_hi.shape), whole(mw_lo.shape),
        ],
        out_specs=pl.BlockSpec((1, c, 1, h_out, w_out),
                               lambda i: (0, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_cf, x_cf, wd, mh_hi, mh_lo, mw_hi, mw_lo)


# ------------------------------------------------------------------- VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_tail_softmax(x_cf: jax.Array, sizes, out_dtype, interpret):
    """(1, C, d, h, w) channel-first -> trilinear resize to ``sizes`` +
    softmax(axis=1), one fused Pallas pass. ``out_dtype`` is the public
    output dtype (the module tail casts to the caller's input dtype
    BEFORE the softmax; this kernel keeps the softmax fp32 and casts the
    probabilities — at most 1 bf16 rounding apart, strictly tighter)."""
    return _tail_impl(x_cf, tuple(int(s) for s in sizes),
                      jnp.dtype(out_dtype), bool(interpret))


def _tail_fwd(x_cf, sizes, out_dtype, interpret):
    y = fused_tail_softmax(x_cf, sizes, out_dtype, interpret)
    # zero-element proxy: carries the input's spatial shape + dtype into
    # bwd statically without keeping x_cf resident (residual leaves must
    # be arrays; shapes/dtypes of tracers are static)
    proxy = jnp.zeros((0,) + x_cf.shape[2:], x_cf.dtype)
    return y, (y, proxy)


def _tail_bwd(sizes, out_dtype, interpret, res, g):
    from ..ops.resize import _axis_matmul
    y, proxy = res
    x_shape, x_dtype = (1, 1) + proxy.shape[1:], proxy.dtype
    yf = y.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    gz = yf * (gf - jnp.sum(yf * gf, axis=1, keepdims=True))
    # transposed interpolation matmuls back to the input grid
    for ax, n_in in zip(range(2, 5), x_shape[2:]):
        n_out = gz.shape[ax]
        if n_in == n_out:
            continue
        gz = _axis_matmul(gz, _linear_matrix_np(n_in, n_out).T, ax)
    return (gz.astype(x_dtype),)


fused_tail_softmax.defvjp(_tail_fwd, _tail_bwd)


# ---------------------------------------------------------------- router

def tail_supported(shape, sizes) -> bool:
    """Static routing predicate for the fused tail kernel."""
    if len(shape) != 5 or len(sizes) != 3:
        return False
    b, c, d_in, h_in, w_in = shape
    d_out, h_out, w_out = (int(s) for s in sizes)
    if b != 1 or not (1 <= c <= _MAX_CHANNELS):
        return False
    if min(d_in, h_in, w_in, d_out, h_out, w_out) < 1:
        return False
    itemsize = 4
    in_bytes = 2 * c * h_in * -(-w_in // 128) * 128 * itemsize
    out_bytes = c * h_out * -(-w_out // 128) * 128 * itemsize
    return in_bytes + out_bytes <= _MAX_BLOCK_BYTES


def maybe_fused_tail(x_cf: jax.Array, sizes: Sequence[int], out_dtype,
                     ) -> Optional[jax.Array]:
    """Route the fused resize+softmax tail when supported, else None.

    Env override ``M3SEG_PALLAS_TAIL``: "1" forces on (interpret mode
    off-TPU, for tests), "0" forces off, default auto (TPU only).
    Callers must already have applied conv_out (channel axis = final
    logits) and guarantee the pad/crop after the resize is a no-op
    (always true when resizing to the original image size)."""
    mode = os.environ.get("M3SEG_PALLAS_TAIL", "auto")
    if mode == "0":
        return None
    if not (mode == "1" or jax.default_backend() == "tpu"):
        return None
    if x_cf.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if not tail_supported(x_cf.shape, sizes):
        return None
    interpret = jax.default_backend() != "tpu"
    return fused_tail_softmax(x_cf, tuple(int(s) for s in sizes),
                              jnp.dtype(out_dtype), interpret)
