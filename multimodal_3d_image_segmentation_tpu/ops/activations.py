"""Activation registry (name -> jax.nn function).

Mirrors the reference's ``getattr(torch.nn.functional, name)`` convention
(e.g. ``nets/nets_utils.py:172-174``). SELU constants in jax.nn.selu match
PyTorch's, preserving the self-normalizing property.
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

__all__ = ["get_activation", "is_selu"]

_REGISTRY = {
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": jax.nn.leaky_relu,
    "softplus": jax.nn.softplus,
    "softmax": jax.nn.softmax,
    "identity": lambda x: x,
    "linear": lambda x: x,
}


def get_activation(act: Optional[Union[str, Callable]]) -> Optional[Callable]:
    if act is None or callable(act):
        return act
    if act not in _REGISTRY:
        raise ValueError(f"Unknown activation {act!r}")
    return _REGISTRY[act]


def is_selu(act) -> bool:
    """True when the activation is SELU (triggers SNN init / no-norm rules,
    reference ``nets/hnosegxs.py:142-143``)."""
    return act == "selu" or act is jax.nn.selu
