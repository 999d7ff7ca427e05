"""Prototype: Pallas conv_in kernel (k=2, s=2, pad 1, tiny C_in).

Reads the channel-first input (dense, no lane padding), computes the
space-to-depth matmul + bias + SELU in VMEM, writes the channels-last
half-resolution output directly (no separate transpose).
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


def conv_in_kernel(x_ref, w_ref, b_ref, o_ref):
    # x_ref: (C, 2dt, 2ht, 2W2) ; w_ref: (8, C, F) ; o_ref: (dt, ht, W2, F)
    c = x_ref.shape[0]
    dt = o_ref.shape[0]
    ht = o_ref.shape[1]
    w2 = o_ref.shape[2]
    f = o_ref.shape[3]
    acc = jnp.zeros((dt, ht, w2, f), jnp.float32)
    k = 0
    for dz in range(2):
        for dy in range(2):
            for dw in range(2):
                sub = x_ref[:, dz::2, dy::2, dw::2]  # (C, dt, ht, W2)
                # tiny C: explicit MAC over channels (Mosaic cannot
                # reshape-for-dot here); lane-broadcast of the (F,) rows
                for ci in range(c):
                    acc = acc + sub[ci][..., None] * w_ref[k, ci]
                k += 1
    o_ref[:] = _selu(acc + b_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dt", "ht"))
def conv_in_pallas(x, kernel, bias, dt=11, ht=4):
    """x (B=1, C, D, H, W); kernel (2,2,2,C,F); returns (1, D2, H2, W2, F)."""
    b, c, d, h, w = x.shape
    d2, h2, w2 = d // 2 + 1, h // 2 + 1, w // 2 + 1
    x_pad = jnp.pad(x[0], ((0, 0), (1, 2 * d2 - d - 1), (1, 2 * h2 - h - 1),
                           (1, 2 * w2 - w - 1)))
    # pad grid dims to tile multiples
    gd, gh = -(-d2 // dt), -(-h2 // ht)
    x_pad = jnp.pad(x_pad, ((0, 0), (0, 2 * (gd * dt - d2)),
                            (0, 2 * (gh * ht - h2)), (0, 0)))
    wmat = kernel.reshape(8, c, kernel.shape[-1])
    out = pl.pallas_call(
        conv_in_kernel,
        out_shape=jax.ShapeDtypeStruct((gd * dt, gh * ht, w2,
                                        kernel.shape[-1]), x.dtype),
        grid=(gd, gh),
        in_specs=[
            pl.BlockSpec((c, 2 * dt, 2 * ht, 2 * w2),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c, kernel.shape[-1]), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel.shape[-1],), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dt, ht, w2, kernel.shape[-1]),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x_pad, wmat, bias)
    return out[None, :d2, :h2]


def reference(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        jnp.transpose(x, (0, 2, 3, 4, 1)), kernel, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return jax.nn.selu(y + bias)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 240, 240, 155)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((2, 2, 2, 4, 24)) * .2).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(24) * .01).astype(np.float32))

    want = np.asarray(jax.jit(reference)(x, k, b))
    got = np.asarray(conv_in_pallas(x, k, b))
    print("shapes", want.shape, got.shape)
    print("max err:", np.abs(got - want).max())

    ms = timed_loop_ms(lambda v: conv_in_pallas(v, k, b), x)
    print(f"pallas conv_in: {ms:.3f} ms")
    ms = timed_loop_ms(lambda v: reference(v, k, b), x)
    print(f"xla conv_in (transpose+conv+selu): {ms:.3f} ms")


if __name__ == "__main__":
    main()
