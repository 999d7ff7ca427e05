"""Prototype v2: Pallas conv_in kernel with supported ops only.

Per tile: sublane-strided (dz, dy) views, channel-MAC on the VPU into the
even/odd accumulation planes, then ONE pair of selection matmuls
(2W2 -> W2) on the MXU. Output tile (dt, ht, F, W2).
"""
import sys
sys.path.insert(0, "/root/repo")
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

SELU_SCALE = 1.0507009873554804934193349852946
SELU_ALPHA = 1.6732632423543772848170429916717


def _selu(x):
    safe = jnp.where(x > 0, 0.0, x)
    return SELU_SCALE * jnp.where(x > 0, x, SELU_ALPHA * (jnp.exp(safe) - 1.0))


def kernel(x_ref, w_ref, b_ref, s0_ref, s1_ref, o_ref):
    # x: (C, 2dt, 2ht, 2W2); w: (4, 2, C, F); o: (dt, ht, F, W2)
    c = x_ref.shape[0]
    dt, ht, f, w2 = o_ref.shape
    w2x2 = x_ref.shape[3]

    acc0 = jnp.zeros((dt, ht, f, w2x2), jnp.float32)
    acc1 = jnp.zeros((dt, ht, f, w2x2), jnp.float32)
    k = 0
    for dz in range(2):
        for dy in range(2):
            sub = x_ref[:, dz::2, dy::2, :]  # (C, dt, ht, 2W2)
            for ci in range(c):
                s = sub[ci][:, :, None, :]   # (dt, ht, 1, 2W2)
                acc0 = acc0 + s * w_ref[k, 0, ci][None, None, :, None]
                acc1 = acc1 + s * w_ref[k, 1, ci][None, None, :, None]
            k += 1

    r0 = acc0.reshape(dt * ht * f, w2x2)
    r1 = acc1.reshape(dt * ht * f, w2x2)
    out = (jnp.dot(r0, s0_ref[:], preferred_element_type=jnp.float32)
           + jnp.dot(r1, s1_ref[:], preferred_element_type=jnp.float32))
    out = out.reshape(dt, ht, f, w2)
    o_ref[:] = _selu(out + b_ref[:][None, None, :, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dt", "ht"))
def conv_in_pallas2(x, k, b, dt=11, ht=4):
    bsz, c, d, h, w = x.shape
    f = k.shape[-1]
    d2, h2, w2 = d // 2 + 1, h // 2 + 1, w // 2 + 1
    x_pad = jnp.pad(x[0], ((0, 0), (1, 2 * d2 - d - 1), (1, 2 * h2 - h - 1),
                           (1, 2 * w2 - w - 1)))
    gd, gh = -(-d2 // dt), -(-h2 // ht)
    x_pad = jnp.pad(x_pad, ((0, 0), (0, 2 * (gd * dt - d2)),
                            (0, 2 * (gh * ht - h2)), (0, 0)))
    # weights: (4 dz*dy, 2 dw, C, F)
    wk = jnp.stack([jnp.stack([k[dz, dy, dw] for dw in range(2)])
                    for dz in range(2) for dy in range(2)])
    s0 = np.zeros((2 * w2, w2), np.float32)
    s1 = np.zeros((2 * w2, w2), np.float32)
    s0[2 * np.arange(w2), np.arange(w2)] = 1.0
    s1[2 * np.arange(w2) + 1, np.arange(w2)] = 1.0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((gd * dt, gh * ht, f, w2), x.dtype),
        grid=(gd, gh),
        in_specs=[
            pl.BlockSpec((c, 2 * dt, 2 * ht, 2 * w2), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2, c, f), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w2, w2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w2, w2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dt, ht, f, w2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x_pad, wk, b, jnp.asarray(s0), jnp.asarray(s1))
    # (D2, H2, F, W2) -> (1, D2, H2, W2, F)
    return jnp.transpose(out[:d2, :h2], (0, 1, 3, 2))[None]


def reference(x, k, b):
    y = jax.lax.conv_general_dilated(
        jnp.transpose(x, (0, 2, 3, 4, 1)), k, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return jax.nn.selu(y + b)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 240, 240, 155)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((2, 2, 2, 4, 24)) * .2).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(24) * .01).astype(np.float32))

    want = np.asarray(jax.jit(reference)(x, k, b))
    got = np.asarray(conv_in_pallas2(x, k, b))
    print("shapes", want.shape, got.shape, flush=True)
    print("max err:", np.abs(got - want).max(), flush=True)

    print("pallas v2:", timed_loop_ms(lambda v: conv_in_pallas2(v, k, b), x),
          flush=True)
    print("xla ref  :", timed_loop_ms(lambda v: reference(v, k, b), x),
          flush=True)


if __name__ == "__main__":
    main()
