"""Component-level timing on the real TPU via chained fori_loop diffing.

Times each stage of the HNOSeg-XS inference graph at BraTS'23 full
resolution so optimization targets are data-driven, not guessed.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.ops.resize import (resize_linear,
                                                             resize_nearest)

N_SHORT, N_LONG = 2, 10


def timed(name, fn, x, perturb=True):
    """fn: x -> y (same dtype tree). Chained loop timing."""

    def loop(n, x):
        def body(_, carry):
            xc, acc = carry
            y = fn(xc)
            s = jnp.sum(y.ravel()[::4097]) * 1e-12
            return (xc + s.astype(xc.dtype) if perturb else xc,
                    acc + s.astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    short = jax.jit(functools.partial(loop, N_SHORT))
    long = jax.jit(functools.partial(loop, N_LONG))
    float(short(x)); float(long(x))  # compile
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(short(x)); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(long(x)); tl.append(time.perf_counter() - t0)
    ms = (np.median(tl) - np.median(ts)) / (N_LONG - N_SHORT) * 1e3
    print(f"{name:55s} {ms:9.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    G = (1, 121, 121, 78, 24)     # block grid, channels-last
    FULL = (1, 240, 240, 155, 4)
    xg = jnp.asarray(rng.standard_normal(G).astype(np.float32))
    xf = jnp.asarray(rng.standard_normal(FULL).astype(np.float32))
    modes = (10, 14, 14)

    w = jnp.asarray(rng.standard_normal((24, 24)).astype(np.float32) * 0.1)
    wcat = jnp.asarray(rng.standard_normal((48, 24)).astype(np.float32) * .1)

    timed("dht_crop (121,121,78,24)->(20,28,28)", lambda v: spectral.dht_crop(v, modes), xg)

    packed = spectral.dht_crop(xg, modes)

    def inv(v):
        return spectral.dht_pad_inverse(v, (121, 121, 78))
    timed("dht_pad_inverse (20,28,28,24)->(121,121,78)", inv, packed)

    def freq_chain(v):
        for _ in range(3):
            v = jax.nn.selu(jnp.einsum("...i,oi->...o", v, w) + v)
        return v
    timed("freq chain x3 on packed", freq_chain, packed)

    def block(v):
        p = spectral.dht_crop(v, modes)
        p = freq_chain(p)
        y = jax.nn.selu(spectral.dht_pad_inverse(p, (121, 121, 78)))
        y = jax.nn.selu(jnp.einsum("...i,io->...o", y, wcat[:24])
                        + jnp.einsum("...i,io->...o", v, wcat[24:]))
        return y
    timed("full HNOXS block (virtual concat)", block, xg)

    timed("conv_concat only (2x einsum 24->24 + add + selu)",
          lambda v: jax.nn.selu(jnp.einsum("...i,io->...o", v, wcat[:24])
                                + jnp.einsum("...i,io->...o", v, wcat[24:])),
          xg)

    small4 = jnp.asarray(rng.standard_normal((1, 121, 121, 78, 4)).astype(np.float32))
    timed("resize_linear gather 4ch (121,121,78)->(240,240,155)",
          lambda v: resize_linear(v, (240, 240, 155)), small4)
    timed("resize_linear gather 24ch", lambda v: resize_linear(v, (240, 240, 155)), xg)

    def softmax_argmax(v):
        return jnp.argmax(jax.nn.softmax(v, -1), -1).astype(jnp.uint8).astype(jnp.float32)[..., None]
    big4 = jnp.asarray(rng.standard_normal((1, 240, 240, 155, 4)).astype(np.float32))
    timed("softmax+argmax at 240^3 x4", softmax_argmax, big4, perturb=False)

    win = jnp.asarray(rng.standard_normal((2, 2, 2, 4, 24)).astype(np.float32) * .1)
    def conv_in(v):
        return jax.lax.conv_general_dilated(
            v, win, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    timed("conv_in k2s2 4->24 at 240^3", conv_in, xf)

    # precision sweep on the transform
    for prec in ["highest", "high", "default"]:
        spectral.PRECISION = {"highest": jax.lax.Precision.HIGHEST,
                              "high": jax.lax.Precision.HIGH,
                              "default": jax.lax.Precision.DEFAULT}[prec]
        timed(f"dht_crop precision={prec}",
              lambda v: spectral.dht_crop(v, modes), xg)
        timed(f"dht_pad_inverse precision={prec}", inv, packed)
    spectral.PRECISION = jax.lax.Precision.HIGHEST


if __name__ == "__main__":
    main()
