"""Shared Mosaic-safe numeric helpers for the Pallas kernels.

These were previously copy-pasted per kernel file; numerically sensitive
code (the manual SELU for Mosaic's missing ``expm1``, the bf16 hi/lo
mantissa split behind every bf16x3 fp32-class dot) lives here once so
the implementations cannot drift apart.
"""
from __future__ import annotations

import jax.numpy as jnp

SELU_SCALE = 1.0507009873554804934193349852946
SELU_ALPHA = 1.6732632423543772848170429916717


def selu(x):
    """Manual SELU (Mosaic lacks ``expm1``); ``exp`` is guarded against
    overflow on the positive branch."""
    safe = jnp.where(x > 0, 0.0, x)
    return SELU_SCALE * jnp.where(
        x > 0, x, SELU_ALPHA * (jnp.exp(safe) - 1.0))


def elu(x):
    safe = jnp.where(x > 0, 0.0, x)
    return jnp.where(x > 0, x, jnp.exp(safe) - 1.0)


def hi_lo(v):
    """fp32 -> (bf16 hi, bf16 lo) mantissa split: the residual after the
    bf16 round-trip is exactly representable in bf16 for the bf16x3
    precision trick's error bound to hold."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo
