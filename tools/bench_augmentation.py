"""Host vs on-device augmentation benchmark (the README's '5.6x' claim as
a reproducible artifact).

Host path: ``data/augmentation.py`` ImageTransform (random affine,
C++/OpenMP nearest resampler) per sample on the CPU — the reference's
pipeline shape (scipy/SimpleITK there).
Device path: ``data/augmentation_device.py`` — the same random affine
applied INSIDE the jitted train step; measured as the marginal step-time
cost of augmentation at the training resolution.

``--artifact`` writes BENCH_AUG.json at the repo root.
"""
import sys
sys.path.insert(0, "/root/repo")  # noqa: E402

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import losses, models
from multimodal_3d_image_segmentation_tpu.data.augmentation import (
    ImageTransform)
from multimodal_3d_image_segmentation_tpu.data.augmentation_device import (
    make_device_augment)
from multimodal_3d_image_segmentation_tpu.runtime import (
    build_optimizer, create_train_state, make_train_step)
from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

SHAPE = (120, 120, 78)
KW = dict(rotation_range=[30, 0, 0], shift_range=[0.2, 0.2, 0.2],
          zoom_range=[0.8, 1.2], augmentation_probability=1.0)


def bench_host(n=8):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4,) + SHAPE).astype(np.float32)
    y = rng.integers(0, 4, (1,) + SHAPE).astype(np.float32)
    tf = ImageTransform(seed=0, **KW)
    tf(x, y)  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        tf(x, y)
    ms = (time.perf_counter() - t0) / n * 1e3
    return ms


def bench_device():
    model = models.HNOSegXS(4, 4, 24, [3] * 8, (10, 14, 14),
                            use_pallas=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4) + SHAPE).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, (1, 1) + SHAPE).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    tx = build_optimizer({"optimizer_name": "Adamax", "lr": 5e-3})
    state = create_train_state(model, params, tx)

    def step_time(augment_fn):
        step = make_train_step(losses.pcc_loss, 4, None,
                               augment_fn=augment_fn, augment_seed=0)

        def body(v):
            st, loss = step(state, v, y)
            # consume the updated params so the optimizer update (and the
            # backward pass feeding it) cannot be dead-code eliminated
            leaf = jax.tree_util.tree_leaves(st.params)[0]
            return v + (loss + jnp.sum(leaf) * 1e-12) * 1e-9

        return timed_loop_ms(body, x, n_short=1, n_long=5, repeats=3)

    base = step_time(None)
    aug = step_time(make_device_augment(**KW))
    return base, aug


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", action="store_true")
    args = ap.parse_args()
    host_ms = bench_host()
    base_ms, aug_ms = bench_device()
    dev_marginal = max(aug_ms - base_ms, 0.0)
    result = {
        "shape": list(SHAPE),
        "host_transform_ms_per_sample": round(host_ms, 2),
        "train_step_ms_no_aug": round(base_ms, 2),
        "train_step_ms_with_device_aug": round(aug_ms, 2),
        "device_aug_marginal_ms": round(dev_marginal, 2),
        "host_vs_device_marginal_speedup": round(
            host_ms / max(dev_marginal, 1e-6), 2),
        "backend": jax.default_backend(),
        "note": "host path uses the C++/OpenMP native resampler when "
                "available; device path is the in-step random affine "
                "(data/augmentation_device.py)",
    }
    print(json.dumps(result))
    if args.artifact:
        with open("/root/repo/BENCH_AUG.json", "w") as f:
            json.dump(result, f, indent=1)
        print("wrote BENCH_AUG.json")


if __name__ == "__main__":
    main()
