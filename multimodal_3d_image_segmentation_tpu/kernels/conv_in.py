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

__all__ = ["conv_in_s2d"]

_SELU_SCALE = 1.0507009873554804934193349852946
_SELU_ALPHA = 1.6732632423543772848170429916717


def _selu(x):
    safe = jnp.where(x > 0, 0.0, x)
    return _SELU_SCALE * jnp.where(x > 0, x,
                                   _SELU_ALPHA * (jnp.exp(safe) - 1.0))


def _kernel(x_ref, w_ref, b_ref, o_ref):
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
    out = _selu(acc + b_ref[:][None, None, :, None].astype(jnp.float32))
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
        _kernel,
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


def _reference_xla(x_cf, kernel, bias):
    """XLA reference implementation (also supplies the backward pass)."""
    y = jax.lax.conv_general_dilated(
        jnp.transpose(x_cf, (0, 2, 3, 4, 1)), kernel, (2, 2, 2),
        [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return jax.nn.selu(y + bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_in_vjp(x_cf, kernel, bias, interpret):
    d2 = x_cf.shape[2] // 2 + 1
    dt = min(11, d2)
    return _conv_in_impl(x_cf, kernel, bias, dt=dt, ht=4,
                         interpret=interpret)


def _conv_in_fwd(x_cf, kernel, bias, interpret):
    return _conv_in_vjp(x_cf, kernel, bias, interpret), (x_cf, kernel, bias)


def _conv_in_bwd(interpret, res, g):
    # Gradients via the (numerically matching) XLA formulation; the Pallas
    # kernel is only the forward fast path.
    x_cf, kernel, bias = res
    _, vjp = jax.vjp(_reference_xla, x_cf, kernel, bias)
    return vjp(g)


_conv_in_vjp.defvjp(_conv_in_fwd, _conv_in_bwd)


def conv_in_s2d(x_cf: jax.Array, kernel: jax.Array, bias: jax.Array,
                interpret=None) -> jax.Array:
    """Fused k=2/s=2/pad=1 conv + bias + SELU.

    Args:
        x_cf: channel-first input (1, C, D, H, W).
        kernel: (2, 2, 2, C, F) conv kernel (flax DHWIO layout).
        bias: (F,).

    Returns:
        Channels-last (1, D//2+1, H//2+1, W//2+1, F), matching
        ``ConvNormAct(F, kernel_size=2, strides=2)`` + SELU exactly.
        Differentiable (custom VJP; backward runs through XLA).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv_in_vjp(x_cf, kernel, bias, bool(interpret))
