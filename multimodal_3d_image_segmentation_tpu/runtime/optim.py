"""Optimizers and learning-rate schedules (optax), config-driven.

Mirrors the reference's dynamic lookup (``experiments/run.py:89-103``):
optimizer by name with torch-style kwargs (lr, betas, eps, weight_decay,
momentum), and the CosineAnnealingWarmRestarts scheduler stepped per batch
with ``T_0`` defaulting to (train batches * epochs) — i.e. a single cosine
ramp over the whole run unless ``restart_epochs`` is given.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import optax

__all__ = ["build_optimizer", "cosine_annealing_warm_restarts",
           "build_schedule"]


def cosine_annealing_warm_restarts(base_lr: float, t_0: int,
                                   eta_min: float = 0.0, t_mult: int = 1):
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts, per-step.

    lr(t) = eta_min + (base - eta_min) * (1 + cos(pi * t_cur / T_i)) / 2
    with restarts every T_i = T_0 * t_mult^i steps.
    """
    assert t_0 > 0

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t_0)
            t_i = float(t_0)
        else:
            # closed-form cycle lookup for geometric restarts
            n = jnp.floor(jnp.log1p((t_mult - 1.0) * step / t_0)
                          / math.log(t_mult))
            start = t_0 * (jnp.power(float(t_mult), n) - 1.0) / (t_mult - 1.0)
            t_cur = step - start
            t_i = t_0 * jnp.power(float(t_mult), n)
        return eta_min + (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule


def build_schedule(scheduler_args: Optional[Dict[str, Any]], base_lr: float,
                   steps_per_epoch: int, num_epochs: int):
    """Build an optax schedule from a [scheduler] config section."""
    if not scheduler_args:
        return base_lr
    args = dict(scheduler_args)
    name = args.pop("scheduler_name")
    if name == "CosineAnnealingWarmRestarts":
        if "T_0" not in args and "restart_epochs" not in args:
            t_0 = steps_per_epoch * num_epochs
        elif "restart_epochs" in args:
            t_0 = steps_per_epoch * args.pop("restart_epochs")
        else:
            t_0 = args.pop("T_0")
        return cosine_annealing_warm_restarts(
            base_lr, t_0, eta_min=args.pop("eta_min", 0.0),
            t_mult=args.pop("T_mult", 1))
    if name == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            base_lr, args.pop("T_max"), alpha=args.pop("eta_min", 0.0)
            / max(base_lr, 1e-30))
    if name == "StepLR":
        step_size = args.pop("step_size")
        gamma = args.pop("gamma", 0.1)
        return optax.exponential_decay(
            base_lr, step_size * steps_per_epoch, gamma, staircase=True)
    raise ValueError(f"Unknown scheduler {name!r}")


def build_optimizer(optimizer_args: Dict[str, Any],
                    schedule=None) -> optax.GradientTransformation:
    """Optimizer by torch-style name/kwargs (reference
    ``experiments/run.py:89-91``)."""
    args = dict(optimizer_args)
    name = args.pop("optimizer_name")
    lr = schedule if schedule is not None else args.pop("lr", 1e-3)
    if schedule is not None:
        args.pop("lr", None)

    betas = args.pop("betas", (0.9, 0.999))
    eps = args.pop("eps", 1e-8)
    # None = key absent; an explicit 0.0 must mean ZERO decay (a falsy-or
    # fallback would silently re-enable AdamW's default 1e-2)
    weight_decay = args.pop("weight_decay", None)

    amsgrad = args.pop("amsgrad", False)
    if amsgrad and name not in ("Adam",):
        raise ValueError(f"amsgrad=True is not supported for {name!r}")

    if name == "Adamax":
        tx = optax.adamax(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "Adam":
        tx = (optax.amsgrad if amsgrad else optax.adam)(
            lr, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "AdamW":
        # torch AdamW's default decay is 1e-2 when the config omits it
        wd = 1e-2 if weight_decay is None else weight_decay
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=wd)
        weight_decay = None
    elif name == "SGD":
        if args.pop("dampening", 0):
            raise ValueError("SGD dampening != 0 is not supported")
        tx = optax.sgd(lr, momentum=args.pop("momentum", 0.0),
                       nesterov=args.pop("nesterov", False))
    elif name == "RMSprop":
        tx = optax.rmsprop(lr, decay=args.pop("alpha", 0.99), eps=eps,
                           momentum=args.pop("momentum", 0.0))
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    if weight_decay:  # torch semantics: decay 0.0 by default elsewhere
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)

    if args.pop("maximize", False):
        raise ValueError("maximize=True is not supported")
    for key in ("foreach", "capturable", "differentiable", "fused"):
        args.pop(key, None)  # torch execution knobs, numerically inert
    if args:
        # the reference forwards [optimizer] kwargs verbatim to torch;
        # silently dropping a key here would train with different
        # semantics than the config specifies
        raise ValueError(f"Unsupported [optimizer] keys for {name!r}: "
                         f"{sorted(args)}")
    return tx
