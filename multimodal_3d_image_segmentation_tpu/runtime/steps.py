"""Jitted train / eval / predict steps.

The reference's eager per-batch loop (``experiments/train_test.py:140-214``)
becomes three compiled functions; label remap + one-hot happen on device
inside the step so the host only ships raw integer labels.

All steps are pure (state, batch) -> outputs and compose with any
``jax.sharding`` placement: run them under a Mesh with sharded inputs and
XLA inserts the gradient psum (data parallelism) and spatial collectives
(volume sharding) automatically.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax.training import train_state

from ..utils.labels import remap_labels, to_categorical

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "make_predict_step", "make_sharded_apply"]


class TrainState(train_state.TrainState):
    """Standard flax train state (params + optimizer state + step)."""
    pass


def create_train_state(model, params, tx, apply_fn=None) -> TrainState:
    return TrainState.create(apply_fn=apply_fn or model.apply,
                             params=params, tx=tx)


def make_sharded_apply(model, mesh):
    """Data-parallel ``shard_map`` wrapper around ``model.apply``.

    Params replicated, batch sharded over the mesh's ``data`` axis: inside
    the wrapper each device traces its per-device batch, so the
    single-device Pallas kernel paths (which gate on batch 1) compose
    with data-parallel meshes — the round-2 limitation where
    ``use_pallas`` had to be dropped under any ``[parallel]`` mesh.
    Differentiable: ``shard_map``'s transpose psums the replicated
    params' cotangent, which is exactly the DP gradient all-reduce.

    Only valid for ``n_spatial == 1`` meshes (spatially sharded Pallas
    kernels would need halo exchanges) and batch sizes divisible by
    ``n_data``.
    """
    try:
        from jax import shard_map
        _relax = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        _relax = {"check_rep": False}
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, SPATIAL_AXIS

    assert mesh.shape.get(SPATIAL_AXIS, 1) == 1, (
        "make_sharded_apply composes Pallas kernels with the data axis "
        "only; spatial sharding uses the XLA module path")
    assert DATA_AXIS in mesh.shape, (
        f"make_sharded_apply needs a {DATA_AXIS!r} mesh axis "
        f"(got axes {tuple(mesh.shape)})")

    def fwd(variables, x):
        return model.apply(variables, x)

    # the non-divisible fallback runs replicated inside the mesh jit,
    # where an unpartitioned pallas_call would hit the SPMD partitioner;
    # route it through the (numerics-identical) XLA module path. Clear
    # every kernel-routing flag the model may carry (HNOSegXS's
    # use_flat also reaches pallas_call independently of use_pallas).
    _kernel_flags = {f: False for f in ("use_pallas", "use_flat")
                     if getattr(model, f, False)}
    fallback = model.clone(**_kernel_flags) if _kernel_flags else model

    def apply_fn(variables, x):
        if x.shape[0] % mesh.shape[DATA_AXIS]:
            return fallback.apply(variables, x)  # replicated fallback
        in_spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return shard_map(fwd, mesh=mesh, in_specs=(P(), in_spec),
                         out_specs=in_spec, **_relax)(variables, x)

    return apply_fn


def make_train_step(loss_fn: Callable, num_labels: int,
                    label_mapping: Optional[Dict[int, int]] = None,
                    donate: bool = True,
                    augment_fn: Optional[Callable] = None,
                    augment_seed: int = 0):
    """Build the jitted training step.

    Args:
        loss_fn: (y_pred, y_true_onehot) -> scalar.
        num_labels: number of classes for one-hot.
        label_mapping: optional {old: new} label remap applied on device.
        augment_fn: optional on-device augmentation (key, x, y) -> (x, y)
            (see ``data.augmentation_device.make_device_augment``), applied
            inside the jitted step with a per-step PRNG key.
    """

    def step(state: TrainState, x, y):
        if augment_fn is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(augment_seed),
                                     state.step)
            x, y = augment_fn(key, x.astype(jnp.float32),
                              y.astype(jnp.float32))
        y = remap_labels(y, label_mapping)
        y1h = to_categorical(y, num_labels)

        def compute_loss(params):
            y_pred = state.apply_fn({"params": params}, x)
            return loss_fn(y_pred, y1h)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_fn: Callable, num_labels: int,
                   label_mapping: Optional[Dict[int, int]] = None):
    def step(state: TrainState, x, y):
        y = remap_labels(y, label_mapping)
        y1h = to_categorical(y, num_labels)
        y_pred = state.apply_fn({"params": state.params}, x)
        return loss_fn(y_pred, y1h)

    return jax.jit(step)


def make_predict_step(model, apply_fn=None):
    """Forward + argmax to uint8 labels (reference
    ``experiments/train_test.py:395-410``): argmax happens on device so only
    the small label volume crosses back to host. ``apply_fn`` overrides
    ``model.apply`` (e.g. the depth-sharded flat wrapper,
    ``parallel/flat_sharded.make_flat_sharded_apply``)."""
    apply = apply_fn or model.apply

    def step(params, x):
        y_pred = apply({"params": params}, x)
        return jnp.argmax(y_pred, axis=1).astype(jnp.uint8)

    return jax.jit(step)
