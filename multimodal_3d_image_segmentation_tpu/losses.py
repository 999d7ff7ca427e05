"""Training losses (PCC, Dice, exponential Dice).

Re-designs of the reference ``nets/custom_losses.py:17-133``. All losses
take ``(y_pred, y_true)`` with one-hot ground truth, channel-first
(B, C, *spatial) — the reference's public contract — and reduce over the
spatial axes per (batch, label) before averaging.

Both class-style (``PCCLoss()(y_pred, y_true)``) and functional entry
points are provided; everything is jit/grad-compatible pure jnp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["corrcoef", "pcc_loss", "dice_coef", "dice_loss", "exp_dice_loss",
           "PCCLoss", "DiceLoss", "ExpDiceLoss", "get_loss"]

_EPS = 1e-7


def _spatial_axes(ndim: int):
    assert ndim in (3, 4, 5)
    return tuple(range(2, ndim))


def corrcoef(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation per (batch, label) over spatial dims
    (reference ``nets/custom_losses.py:17-41``)."""
    axis = _spatial_axes(y_true.ndim)
    y_true = y_true - jnp.mean(y_true, axis=axis, keepdims=True)
    y_pred = y_pred - jnp.mean(y_pred, axis=axis, keepdims=True)
    tp = jnp.sum(y_true * y_pred, axis=axis)
    tt = jnp.sum(jnp.square(y_true), axis=axis)
    pp = jnp.sum(jnp.square(y_pred), axis=axis)
    return tp / jnp.sqrt(tt * pp + _EPS)


def pcc_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """PCC loss = mean(1 - (r + 1)/2) (MLMI 2022; reference
    ``nets/custom_losses.py:44-70``)."""
    r = corrcoef(y_pred, y_true)
    return jnp.mean(1.0 - (r + 1.0) * 0.5)


def dice_coef(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Soft Dice per (batch, label) (reference
    ``nets/custom_losses.py:73-90``)."""
    axis = _spatial_axes(y_true.ndim)
    intersection = jnp.sum(y_true * y_pred, axis=axis)
    union = jnp.sum(y_true + y_pred, axis=axis)
    return 2.0 * intersection / (union + _EPS)


def dice_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(1.0 - dice_coef(y_pred, y_true))


def exp_dice_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                  exp: float = 0.3) -> jnp.ndarray:
    """Exponential logarithmic Dice loss (MICCAI 2018; reference
    ``nets/custom_losses.py:114-133``)."""
    d = dice_coef(y_pred, y_true)
    d = jnp.clip(d, _EPS, 1.0 - _EPS)
    return jnp.mean(jnp.power(-jnp.log(d), exp))


class PCCLoss:
    def __call__(self, y_pred, y_true):
        return pcc_loss(y_pred, y_true)


class DiceLoss:
    def __call__(self, y_pred, y_true):
        return dice_loss(y_pred, y_true)


class ExpDiceLoss:
    def __init__(self, exp: float = 0.3):
        self.exp = exp

    def __call__(self, y_pred, y_true):
        return exp_dice_loss(y_pred, y_true, self.exp)


_LOSSES = {"PCCLoss": PCCLoss, "DiceLoss": DiceLoss, "ExpDiceLoss": ExpDiceLoss}


def get_loss(loss_name: str, **kwargs):
    """Config-driven loss lookup (reference ``experiments/run.py:105-110``).

    Falls back to a cross-entropy if the name is not a custom loss (the
    reference falls back to ``torch.nn`` losses there).
    """
    if loss_name in _LOSSES:
        return _LOSSES[loss_name](**kwargs)
    if loss_name in ("CrossEntropyLoss", "cross_entropy"):
        weight = kwargs.pop("weight", None)
        if kwargs:  # the reference forwards kwargs to torch.nn losses —
            # never drop a configured loss argument silently
            raise ValueError(
                f"Unsupported cross-entropy args: {sorted(kwargs)}")
        w = None if weight is None else jnp.asarray(weight, jnp.float32)

        def ce(y_pred, y_true):
            # torch.nn.CrossEntropyLoss treats its input as LOGITS and
            # applies log_softmax internally; the reference feeds it the
            # models' softmax probabilities (experiments/run.py:105-110),
            # so value parity requires the same "double softmax" here
            logp = jax.nn.log_softmax(y_pred, axis=1)
            if w is None:
                return -jnp.mean(jnp.sum(y_true * logp, axis=1))
            # torch CrossEntropyLoss(weight=...) 'mean': each voxel's
            # loss scaled by its true class's weight, normalized by the
            # summed weights
            wc = w.reshape((1, -1) + (1,) * (y_true.ndim - 2))
            per_w = -jnp.sum(y_true * (logp * wc), axis=1)
            pix_w = jnp.sum(y_true * wc, axis=1)
            return jnp.sum(per_w) / jnp.sum(pix_w)
        return ce
    raise ValueError(f"Unknown loss {loss_name!r}")
