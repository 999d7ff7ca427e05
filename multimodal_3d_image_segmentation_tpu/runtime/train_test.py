"""Training and testing engine.

Re-design of reference ``experiments/train_test.py:31-426`` with identical
run artifacts and selection semantics:

  * epoch loop with train/valid phases; loss averaged per epoch;
  * the LR schedule advances per *batch* (encoded in the optax schedule);
  * best model = lowest validation loss after ``selection_epoch_portion``
    of the epochs; weights-only export to ``model/model.msgpack``;
  * checkpoint every ``checkpoint_epoch`` epochs and on each new best;
    resume restores epoch/state/min_loss/best_epoch and truncates
    ``stdout.txt`` back to the last checkpoint line so the log-derived
    loss curves stay consistent;
  * everything printed is teed to ``stdout.txt``; ``plot_loss.pdf`` is
    re-parsed from that log by regex (the log is the metrics database);
  * ``model_summary.txt`` written from ``flax.linen.tabulate``;
  * testing: per-volume prediction with warm-up exclusion, argmax on
    device, ``{pid}_true/_pred.nii.gz`` outputs, timing + device memory
    stats to ``prediction_time_memory.txt``.

TPU specifics: steps are jit-compiled once per (shape, dtype); the host
loop only ships numpy batches and reads back scalar losses. With a mesh
configured, batches are sharded over (data, spatial) axes and the state is
replicated — XLA inserts the collectives.
"""
from __future__ import annotations

import os
import re
import time
from os.path import join

import numpy as np

import jax
import jax.numpy as jnp

import matplotlib
if "DISPLAY" not in os.environ:
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..data.nifti import write_image
from ..parallel.mesh import batch_sharding, replicated
from ..utils.labels import remap_labels
from ..utils.prefetch import device_prefetch
from .checkpoint import (AsyncCheckpointer, load_params,
                         make_checkpointer,
                         save_params)
from .steps import (create_train_state, make_eval_step, make_predict_step,
                    make_sharded_apply, make_train_step)

__all__ = ["training", "testing", "plot_losses", "get_losses_from_file",
           "save_model_summary", "save_model_graph", "save_output"]


class _Tee:
    """Print to stdout (optionally) and append to stdout.txt — the
    reference's print-and-tee pattern
    (``experiments/train_test.py:177-184``)."""

    def __init__(self, path, is_print=True):
        self.path = path
        self.is_print = is_print

    def __call__(self, *args, file_only=False, **kwargs):
        if self.is_print and not file_only:
            print(*args, **kwargs)
        with open(self.path, "a") as f:
            print(*args, file=f, **kwargs)


def save_model_summary(model, input_shape, path=None):
    """Write a layer table via nn.tabulate (analog of torchinfo summary,
    reference ``experiments/utils.py:122-134``)."""
    import flax.linen as nn
    x = jnp.zeros(input_shape, jnp.float32)
    txt = nn.tabulate(model, jax.random.PRNGKey(0),
                      compute_flops=False, compute_vjp_flops=False)(x)
    if path is not None:
        with open(path, "w") as f:
            f.write(txt)
    return txt


def _graph_rows(model, input_shape):
    """Module-call rows (path tuple, type name, output shapes, #params)
    traced shape-only via flax's summary machinery."""
    from flax.linen import summary as flax_summary
    table = flax_summary._get_module_table(
        model, depth=None, show_repeated=False,
        compute_flops=False, compute_vjp_flops=False)(
        jax.random.PRNGKey(0), jnp.zeros(input_shape, jnp.float32))
    rows = []
    for row in table:
        shapes = [tuple(a.shape) for a in jax.tree_util.tree_leaves(
            row.outputs) if hasattr(a, "shape")]
        n_params = sum(
            int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(
                row.counted_variables) if hasattr(v, "shape"))
        rows.append((row.path, type(row.module_copy).__name__, shapes,
                     n_params))
    return rows


def save_model_graph(model, input_shape, path):
    """Render the architecture as a call-graph PDF (``model_graph.pdf``).

    TPU-native analog of the reference's torchview rendering
    (``experiments/train_test.py:117-122``): one box per module call in
    execution order, indented by module-tree depth, annotated with output
    shapes and parameter counts; edges follow the execution order. The
    trace is shape-only (``eval_shape`` under the hood) — nothing runs on
    device.
    """
    rows = _graph_rows(model, input_shape)
    n = len(rows)
    box_h, gap = 0.7, 0.35
    fig_h = max(2.0, n * (box_h + gap) + 1.0)
    fig, ax = plt.subplots(figsize=(11, fig_h))
    ax.set_axis_off()
    depth_colors = ["#4c72b0", "#55a868", "#c44e52", "#8172b2", "#ccb974",
                    "#64b5cd"]
    centers = []
    for i, (mpath, type_name, shapes, n_params) in enumerate(rows):
        depth = len(mpath)
        y = -i * (box_h + gap)
        x = 0.5 * depth
        label = ".".join(mpath) if mpath else model.__class__.__name__
        shape_txt = ", ".join(str(s) for s in shapes) or "-"
        text = f"{label}  [{type_name}]\nout: {shape_txt}"
        if n_params:
            text += f"   params: {n_params:,}"
        color = depth_colors[depth % len(depth_colors)]
        ax.text(x, y, text, fontsize=8, family="monospace",
                verticalalignment="center",
                bbox=dict(boxstyle="round,pad=0.35", facecolor="white",
                          edgecolor=color, linewidth=1.4))
        centers.append((x, y))
    for (x0, y0), (x1, y1) in zip(centers, centers[1:]):
        ax.annotate("", xy=(x1, y1 + box_h / 2), xytext=(x0, y0 - box_h / 2),
                    arrowprops=dict(arrowstyle="->", color="#888888",
                                    shrinkA=2, shrinkB=2))
    ax.set_xlim(-0.5, 10.5)
    ax.set_ylim(-n * (box_h + gap) - 0.5, box_h)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def save_output(y, data_lists_test, idx_sample, output_dir,
                output_origin=None, suffix=""):
    """Save a label map as ``{pid}{suffix}.nii.gz`` with the patient ID
    taken from the parent folder name (reference
    ``experiments/utils.py:234-257``)."""
    y = np.asarray(y, dtype=np.uint8)
    fname = data_lists_test[0][idx_sample]
    pid = fname.split("/")[-2]
    out = os.path.join(output_dir, f"{pid}{suffix}.nii.gz")
    write_image(y, out, origin=output_origin)


def training(model, input_data, output_dir, loss_fn, tx,
             label_mapping=None, num_epochs=100,
             selection_epoch_portion=0.8, checkpoint_epoch=10,
             is_plot_model=False, is_print=True, plot_epoch_portion=None,
             mesh=None, seed=0, params=None, augment_fn=None,
             augment_seed=None, checkpoint_backend="msgpack"):
    """Train a model; returns the final (best-on-valid) params.

    Args mirror the reference ``training``
    (``experiments/train_test.py:31-68``); ``tx`` is the optax optimizer
    (schedule already bound), ``mesh`` optionally distributes the step.
    ``checkpoint_backend``: 'msgpack' (default) or 'orbax' (multi-host
    sharded async saves) for the train-state checkpoint; the weights-only
    ``model/model.msgpack`` export stays msgpack either way (it is the
    single-file inference artifact).
    """
    model_dir = join(output_dir, "model")
    model_path = join(model_dir, "model.msgpack")
    chkpt_path = join(model_dir, "checkpoint.msgpack")
    stdout_file = join(output_dir, "stdout.txt")
    os.makedirs(model_dir, exist_ok=True)
    tee = _Tee(stdout_file, is_print)

    num_labels = model.out_channels
    image_size = input_data.get_train_image_size()
    input_shape = (input_data.batch_size, model.in_channels) + tuple(
        image_size)

    if params is None:
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1,) + input_shape[1:]))["params"]

    # Pallas kernel paths have no SPMD partitioning rules; under a
    # data-only mesh they compose via a shard_map wrapper (each device
    # traces its per-device batch). Spatial meshes: VNetDS's flat path
    # composes whole-model via the depth-sharded shard_map
    # (parallel/flat_sharded.py — halo'd kernels + psum'd GroupNorm);
    # other kernel models use the XLA module path (run.py drops the
    # flags loudly there).
    apply_fn = None
    from ..parallel.mesh import SPATIAL_AXIS
    if (mesh is not None and (getattr(model, "use_pallas", False)
                              or getattr(model, "use_flat", False))):
        if mesh.shape.get(SPATIAL_AXIS, 1) == 1:
            apply_fn = make_sharded_apply(model, mesh)
        else:
            from ..parallel.flat_sharded import maybe_flat_sharded_apply
            apply_fn = maybe_flat_sharded_apply(
                model, mesh, image_size, input_data.batch_size)
            if apply_fn is None:
                # shapes don't support the depth-sharded flat path: the
                # XLA module path shards transparently (params are
                # identical across paths, so the clone is free)
                flags = {f: False for f in ("use_pallas", "use_flat")
                         if getattr(model, f, False)}
                apply_fn = model.clone(**flags).apply
    state = create_train_state(model, params, tx, apply_fn=apply_fn)

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    # the on-device augmentation stream is keyed by its own seed when the
    # config provides one, so it can be varied/reproduced independently
    # of weight init
    train_step = make_train_step(
        loss_fn, num_labels, label_mapping, augment_fn=augment_fn,
        augment_seed=seed if augment_seed is None else augment_seed)
    eval_step = make_eval_step(loss_fn, num_labels, label_mapping)

    # async saves: train loop never blocks on IO. The best-weights export
    # rides the same backend as the state checkpoints: under 'orbax' each
    # host writes only its addressable shards (a pod with non-replicated
    # params cannot go through the single-host msgpack writer);
    # ``load_params`` dispatches on the resulting '<path>.orbax' directory.
    ckpt = make_checkpointer(checkpoint_backend)
    params_ckpt = ckpt

    if ckpt.exists(chkpt_path):
        state, epoch, min_loss, best_epoch = ckpt.load(chkpt_path, state)
        start_epoch = epoch + 1
        if start_epoch >= num_epochs:
            raise RuntimeError(
                f"Checkpoint detected, but start_epoch ({start_epoch}) >= "
                f"num_epochs ({num_epochs})")
        if is_print:
            print(f"Checkpoint loaded for epoch {start_epoch}")
        # Truncate stdout.txt after the checkpoint marker of the epoch
        # actually restored so the regex-parsed loss curves stay
        # consistent (reference ``experiments/train_test.py:90-100``).
        # Saves are asynchronous, so the log's LAST marker can belong to
        # a write that never committed (crash between tee and the
        # background os.replace) — match the marker to the restored
        # epoch, falling back to the last marker.
        if os.path.exists(stdout_file):
            with open(stdout_file) as f:
                lines = f.readlines()
            cur = None
            idx = last_any = None
            for i, ln in enumerate(lines):
                m = re.match(r"Epoch:\s*(\d+)", ln.strip())
                if m:
                    cur = int(m.group(1))
                if "checkpoint" in ln:
                    last_any = i
                    if cur == epoch:
                        idx = i
            if idx is None:
                idx = last_any
            if idx is not None:
                with open(stdout_file, "w") as f:
                    f.writelines(lines[:idx + 1])
    else:
        start_epoch = 0
        min_loss = float("inf")
        best_epoch = None

        tee("train_num_batches:", input_data.get_train_num_batches())
        tee("valid_num_batches:", input_data.get_valid_num_batches())
        tee()
        try:
            save_model_summary(model, (1,) + input_shape[1:],
                               join(output_dir, "model_summary.txt"))
        except Exception as e:  # tabulate must never kill a run
            if is_print:
                print(f"model summary failed: {e}")
        if is_plot_model:  # reference's torchview model_graph.pdf
            try:
                save_model_graph(model, (1,) + input_shape[1:],
                                 join(output_dir, "model_graph.pdf"))
            except Exception as e:
                if is_print:
                    print(f"model graph failed: {e}")

    train_flow = input_data.get_train_flow(shuffle=True)
    valid_flow = input_data.get_valid_flow()

    def put(x, y):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y)
        if mesh is not None:
            x = jax.device_put(x, batch_sharding(mesh, x.shape))
            y = jax.device_put(y, batch_sharding(mesh, y.shape))
        return x, y

    if is_print:
        print("Training started")
        print(output_dir)

    start_time = time.time()

    for epoch in range(start_epoch, num_epochs):
        # Training phase: double-buffered host->device feeding (the next
        # batch ships to HBM while the current step executes)
        train_losses = []
        for x, y in device_prefetch(train_flow, lambda b: put(*b)):
            state, loss = train_step(state, x, y)
            train_losses.append(loss)
        train_loss = float(np.mean([float(l) for l in train_losses]))
        tee("\n-------------------------")
        tee(f"Epoch: {epoch}")
        tee(f"train_loss: {train_loss}")

        # Validation phase
        valid_losses = []
        for x, y in device_prefetch(valid_flow, lambda b: put(*b)):
            valid_losses.append(eval_step(state, x, y))
        valid_loss = float(np.mean([float(l) for l in valid_losses]))
        tee(f"valid_loss: {valid_loss}")

        # best-model selection BEFORE the periodic checkpoint save, so a
        # checkpoint written at an epoch that is also a new best carries
        # the updated min_loss/best_epoch (stale metadata would make a
        # resumed run re-select a worse 'best' and overwrite the export)
        selection_epoch = int(num_epochs * selection_epoch_portion)
        is_best = ((epoch > selection_epoch or epoch == num_epochs - 1)
                   and valid_loss < min_loss)
        if is_best:
            min_loss = valid_loss
            best_epoch = epoch
            params_ckpt.save_params(model_path, state.params)

        if (epoch + 1) % checkpoint_epoch == 0:
            ckpt.save(chkpt_path, state, epoch, min_loss, best_epoch)
            tee("Standard checkpoint saved.")
        elif is_best:
            ckpt.save(chkpt_path, state, epoch, min_loss, best_epoch)
            tee("Best checkpoint saved.")

    end_time = time.time()
    ckpt.wait()
    params_ckpt.wait()

    if best_epoch is not None:
        params = load_params(model_path, state.params)
    else:  # no training (num_epochs == 0) or no finite valid loss
        params = state.params
        params_ckpt.save_params(model_path, params)
        params_ckpt.wait()
    # close only after the export above: params_ckpt IS ckpt, and the
    # orbax backend's close() tears down its AsyncCheckpointer
    ckpt.close()

    # Plot losses from the log
    try:
        start_plot_epoch = (int(num_epochs * plot_epoch_portion)
                            if plot_epoch_portion is not None else 0)
        losses = get_losses_from_file(stdout_file)
        plot_losses(num_epochs, start_plot_epoch, losses, ["r", "b--"],
                    ["Train loss", "Valid loss"],
                    join(output_dir, "plot_loss.pdf"))
    except Exception as e:
        if is_print:
            print(f"loss plot failed: {e}")

    tee(f"\nTime used: {end_time - start_time:.2f} seconds.")
    tee(f"Best epoch: {best_epoch}")
    tee(f"Min loss: {min_loss}")

    if hasattr(train_flow, "close"):
        train_flow.close()
    if hasattr(valid_flow, "close"):
        valid_flow.close()

    return params


#: Scalar-series patterns recoverable from a training log. Extend this dict
#: to make additional per-epoch scalars plottable.
LOG_SERIES = {
    "train_loss": re.compile(r"\btrain_loss:\s*(\S+)"),
    "valid_loss": re.compile(r"\bvalid_loss:\s*(\S+)"),
}


def get_losses_from_file(filename):
    """Recover the per-epoch loss series from a ``stdout.txt`` training log.

    The log is the source of truth for the loss curves (same contract as
    reference ``experiments/train_test.py``: the plot is reconstructed from
    the log, so a resumed run's truncated log yields a consistent plot).
    Returns ``(train_loss, valid_loss)`` lists of equal length.
    """
    series = {name: [] for name in LOG_SERIES}
    with open(filename) as f:
        for line in f:
            for name, pattern in LOG_SERIES.items():
                m = pattern.search(line)
                if m:
                    series[name].append(float(m.group(1)))
    train_loss, valid_loss = series["train_loss"], series["valid_loss"]
    if len(train_loss) != len(valid_loss):
        raise ValueError(
            f"unbalanced loss log: {len(train_loss)} train_loss vs "
            f"{len(valid_loss)} valid_loss entries in {filename}")
    return train_loss, valid_loss


def plot_losses(num_epochs, start_plot_epoch, losses, styles, labels,
                output_file):
    """Write the loss-curve figure (``plot_loss.pdf`` artifact).

    Same artifact role as the reference's loss plot; rendering is our own.
    ``losses`` is a sequence of per-epoch series; epochs before
    ``start_plot_epoch`` are omitted (early epochs dominate the y-range).
    """
    fig, ax = plt.subplots(figsize=(10, 5))
    epochs = np.arange(num_epochs)
    for series, style, label in zip(losses, styles, labels):
        y = np.asarray(series)[start_plot_epoch:num_epochs]
        ax.plot(epochs[start_plot_epoch:start_plot_epoch + len(y)], y,
                style, label=label)
    ax.set_xlabel("Epoch", fontsize=16)
    ax.set_ylabel("Value", fontsize=16)
    ax.tick_params(labelsize=14)
    ax.grid(True, which="both", alpha=0.5)
    ax.legend(loc="upper right", fontsize=14)
    fig.savefig(output_file, bbox_inches="tight")
    plt.close(fig)


def _device_memory_stats():
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0)
        in_use = stats.get("bytes_in_use", 0)
        return peak / 1024 ** 2, in_use / 1024 ** 2
    except Exception:
        return float("nan"), float("nan")


def testing(model, params, input_data, output_dir, label_mapping=None,
            output_origin=None, is_print=True, mesh=None, save_npz=False):
    """Per-volume prediction on the test split
    (reference ``experiments/train_test.py:332-426``). ``save_npz``
    additionally writes a bulk ``y_true_pred.npz`` (TF-tree parity,
    ``tensorflow/experiments/train_test.py:292``)."""
    assert input_data.batch_size == 1, (
        "testing() follows the reference's per-volume protocol "
        "(experiments/train_test.py:384-414): set [input_args] "
        "batch_size = 1 for test/statistics runs")
    os.makedirs(output_dir, exist_ok=True)
    npz_true, npz_pred = [], []

    test_num_batches = input_data.get_test_num_batches()
    data_lists_test = input_data.data_lists_test

    if is_print:
        print("test_num_batches:", test_num_batches)
        print()
        print("Testing started")
        print(output_dir)

    # Pallas kernel paths have no SPMD partitioning rules: under a mesh,
    # VNetDS's flat path serves depth-sharded through the whole-model
    # shard_map wrapper (parallel/flat_sharded.py); other kernel models
    # fall back to one device (training composed via shard_map instead).
    _kernel_model = (getattr(model, "use_pallas", False)
                     or getattr(model, "use_flat", False))
    _flat_sharded = None
    if mesh is not None and _kernel_model:
        from ..parallel.flat_sharded import maybe_flat_sharded_apply
        _flat_sharded = maybe_flat_sharded_apply(
            model, mesh, input_data.get_test_image_size())
        if _flat_sharded is None:
            mesh = None
    predict_step = make_predict_step(model, apply_fn=_flat_sharded)
    if mesh is not None:
        params = jax.device_put(params, replicated(mesh))

    test_flow = input_data.get_test_flow()
    start_time = time.time()
    predict_times = []

    for i, xy in enumerate(test_flow):
        s_time = time.time()
        y_true = None
        if isinstance(xy, (tuple, list)):
            x, y = xy
            y_true = np.asarray(y, dtype=np.uint8)[0, 0]
        else:
            x = xy
        x = jnp.asarray(x, jnp.float32)
        if mesh is not None:
            if _flat_sharded is not None:
                # the wrapper's shard_map takes the volume replicated
                # (each device slices its depth slab after the entry)
                x = jax.device_put(x, replicated(mesh))
            else:
                from ..parallel.mesh import volume_sharding
                x = jax.device_put(x, volume_sharding(mesh, x.shape))

        y_pred = np.asarray(predict_step(params, x))  # readback = completion
        e_time = time.time()

        if y_true is not None:
            save_output(y_true, data_lists_test, i,
                        os.path.join(output_dir, "images"), output_origin,
                        "_true")
        y_pred = y_pred[0]
        if label_mapping is not None:
            y_pred = remap_labels(y_pred, label_mapping)
        save_output(y_pred, data_lists_test, i,
                    os.path.join(output_dir, "images"), output_origin,
                    "_pred")
        if save_npz:
            npz_true.append(y_true)
            npz_pred.append(y_pred)

        if i != 0:  # first iteration includes compilation
            predict_times.append(e_time - s_time)

    end_time = time.time()

    if save_npz:
        arrays = {"y_pred": np.stack(npz_pred)}
        if all(t is not None for t in npz_true):
            arrays["y_true"] = np.stack(npz_true)
        # unlabeled test sets have no y_true; stacking Nones would build
        # a corrupt object array
        np.savez_compressed(os.path.join(output_dir, "y_true_pred.npz"),
                            **arrays)
    peak_mib, in_use_mib = _device_memory_stats()
    avg_time = float(np.mean(predict_times)) if predict_times else float("nan")

    if is_print:
        print(f"\nTime used: {end_time - start_time:.2f} seconds.")
        print(f"Average prediction time: {avg_time}")
        print(f"peak_device_memory: {peak_mib:.2f} MiB")
        print(f"device_memory_in_use: {in_use_mib:.2f} MiB")
    with open(os.path.join(output_dir, "prediction_time_memory.txt"),
              "w") as f:
        print(f"Average prediction time: {avg_time}", file=f)
        print(f"peak_device_memory: {peak_mib:.2f} MiB", file=f)
        print(f"device_memory_in_use: {in_use_mib:.2f} MiB", file=f)

    if hasattr(test_flow, "close"):
        test_flow.close()
