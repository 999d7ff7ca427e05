"""Parameter initializers matching the reference's distributions.

The reference uses two schemes:
  * default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for weights
    and U(+-1/sqrt(fan_in)) for conv biases (PyTorch conv defaults;
    operator weights: reference ``nets/hartley_operator.py:85-88``).
  * self-normalizing (SNN, used whenever activation == selu):
    kaiming_normal(nonlinearity='linear') == N(0, 1/fan_in) for weights and
    U(-0.001, 0.001) for biases (reference ``nets/nets_utils.py:102-117``).

Initializers here take an explicit fan_in so the same scheme covers conv
kernels, spectral operator weights, and attention projections regardless of
storage layout.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "kaiming_uniform_a5",
    "kaiming_normal_linear",
    "torch_conv_bias",
    "snn_bias",
    "zeros_init",
]


def kaiming_uniform_a5(fan_in: int):
    """U(-b, b) with b = 1/sqrt(fan_in) (kaiming_uniform with a=sqrt(5))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_linear(fan_in: int):
    """N(0, 1/fan_in) (kaiming_normal with linear nonlinearity, gain 1)."""
    std = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_conv_bias(fan_in: int):
    """PyTorch conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return kaiming_uniform_a5(fan_in)


def snn_bias():
    """U(-0.001, 0.001) bias for self-normalizing networks."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -0.001, 0.001)

    return init


def zeros_init():
    def init(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    return init
