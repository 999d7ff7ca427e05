"""Training-step throughput benchmark (forward+backward+Adamax update)
for HNOSeg-XS at the BraTS'23 training resolution 120x120x78."""
import sys
sys.path.insert(0, "/root/repo")

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import losses, models
from multimodal_3d_image_segmentation_tpu.runtime import (build_optimizer,
                                                          create_train_state)
from multimodal_3d_image_segmentation_tpu.utils.labels import to_categorical

SHAPE = (1, 4, 120, 120, 78)
N_SHORT, N_LONG = 2, 8


def main(compute_dtype="float32", use_remat=False):
    model = models.HNOSegXS(4, 4, 24, [3] * 8, (10, 14, 14),
                            compute_dtype=compute_dtype, use_remat=use_remat)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    y1h = to_categorical(jnp.asarray(
        rng.integers(0, 4, (1, 1) + SHAPE[2:]).astype(np.int32)), 4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    tx = build_optimizer({"optimizer_name": "Adamax", "lr": 5e-3})
    state = create_train_state(model, params, tx)

    def one_step(state, x):
        def loss_fn(p):
            return losses.pcc_loss(state.apply_fn({"params": p}, x), y1h)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    def loop(n, state, x):
        def body(_, carry):
            st, xc, acc = carry
            st, loss = one_step(st, xc)
            return st, xc + loss * 1e-9, acc + loss
        st, _, acc = jax.lax.fori_loop(0, n, body,
                                       (state, x, jnp.float32(0)))
        return acc

    short = jax.jit(functools.partial(loop, N_SHORT))
    long = jax.jit(functools.partial(loop, N_LONG))
    float(short(state, x)); float(long(state, x))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(short(state, x)); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(long(state, x)); tl.append(time.perf_counter() - t0)
    ms = (np.median(tl) - np.median(ts)) / (N_LONG - N_SHORT) * 1e3
    print(f"train step {compute_dtype} remat={use_remat}: {ms:.2f} ms/step "
          f"({1000/ms:.1f} steps/s) at {SHAPE}")


if __name__ == "__main__":
    main("float32")
    main("bfloat16")
