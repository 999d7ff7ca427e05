"""Pallas TPU kernel: fused frequency-resident convolution chain.

The HNOSeg-XS inner loop applies n_XS channel-mixing convolutions with
identity skips and SELU on the packed corner spectrum
(reference ``nets/hnosegxs.py:307-329``):

    x <- selu(x @ W_k^T + x),  k = 1..n_XS

The packed spectrum is tiny (e.g. 20x28x28x24 fp32 ~ 1.5 MB) so the whole
chain fits in VMEM. This kernel streams row tiles HBM -> VMEM once, applies
all n_XS matmuls + skips + SELUs on-chip, and writes back once — one HBM
round trip instead of n_XS.

Every frequency point is independent (the weights are shared across modes),
so rows = flattened (batch, modes) and the kernel is a 1D grid over row
tiles.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import selu as _selu

__all__ = ["fused_freq_chain"]

_TILE = 512


def _kernel(x_ref, w_ref, o_ref):
    acc = x_ref[:]
    n_chain = w_ref.shape[0]
    # fp32 inputs get full-precision matmuls (multi-pass on the MXU) so the
    # kernel is numerically interchangeable with the HIGHEST-precision
    # einsum path; bf16 inputs use native single-pass MXU.
    prec = (jax.lax.Precision.HIGHEST if acc.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    for k in range(n_chain):  # static unroll: n_XS is small (typically 3)
        h = jnp.dot(acc, w_ref[k], preferred_element_type=jnp.float32,
                    precision=prec)
        acc = _selu((h + acc).astype(jnp.float32)).astype(acc.dtype)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pallas_rows(x2d: jax.Array, w: jax.Array, interpret: bool):
    n, c = x2d.shape
    n_pad = -n % _TILE
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)))
    grid = (x2d.shape[0] // _TILE,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w.shape[0], c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, w)
    return out[:n] if n_pad else out


def _prec_for(dt):
    return (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _chain_stages(x2d, w):
    """Plain-ops replay of the chain, returning all stage inputs AND the
    pre-activation tensors (so the backward pass does not redo the
    matmuls — they are full-precision multi-pass MXU dots at fp32)."""
    prec = _prec_for(x2d.dtype)
    xs, pres = [x2d], []
    for k in range(w.shape[0]):
        pre = jnp.dot(x2d, w[k], precision=prec) + x2d
        x2d = jax.nn.selu(pre)
        xs.append(x2d)
        pres.append(pre)
    return xs, pres


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_rows(x2d, w, interpret):
    return _pallas_rows(x2d, w, interpret)


def _fused_rows_fwd(x2d, w, interpret):
    # forward via the kernel; keep only the input as residual and
    # rematerialize the (tiny) intermediates in the backward pass
    return _pallas_rows(x2d, w, interpret), (x2d, w)


def _fused_rows_bwd(interpret, res, g):
    x2d, w = res
    prec = _prec_for(x2d.dtype)
    xs, pres = _chain_stages(x2d, w)
    scale = 1.0507009873554804934193349852946
    alpha = 1.6732632423543772848170429916717
    dw = jnp.zeros_like(w)
    dx = g
    for k in range(w.shape[0] - 1, -1, -1):
        pre = pres[k]
        dselu = jnp.where(pre > 0, scale,
                          scale * alpha * jnp.exp(jnp.where(pre > 0, 0.0,
                                                            pre)))
        dpre = dx * dselu
        dw = dw.at[k].set(jnp.dot(xs[k].T, dpre, precision=prec)
                          .astype(w.dtype))
        dx = jnp.dot(dpre, w[k].T, precision=prec) + dpre
    return dx, dw


_fused_rows.defvjp(_fused_rows_fwd, _fused_rows_bwd)


def fused_freq_chain(x: jax.Array, weights: Sequence[jax.Array],
                     interpret: bool = None) -> jax.Array:
    """Apply the fused chain to a packed spectrum (B, *modes, C).

    Args:
        x: packed corner spectrum, channels-last.
        weights: list of (out, in) matrices (reference layout); out == in.
        interpret: run the kernel in interpreter mode (CPU tests).

    Equivalent to: for W in weights: x = selu(einsum('...i,oi->...o', x, W) + x).
    """
    c = x.shape[-1]
    for w in weights:
        assert w.shape == (c, c), "fused chain requires square shared weights"
    if not weights:  # 0-conv chain is the identity (module path parity)
        return x
    if interpret is None:  # interpreter mode off-TPU (tests on CPU)
        interpret = jax.default_backend() != "tpu"
    # '...i,oi->...o' == x @ W^T: pre-transpose once.
    w = jnp.stack([w.T for w in weights]).astype(x.dtype)
    shape = x.shape
    out = _fused_rows(x.reshape(-1, c), w, bool(interpret))
    return out.reshape(shape)
