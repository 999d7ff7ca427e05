"""Per-stage cost breakdown of the NeuralOperatorSeg tower block at bench
shape (240x240x155 input -> tower grid 120x120x77, C=24, fp32 'high').

Measures cumulative subsets so each marginal cost is as-fused-in-context:
  fwd        : forward transform only (dht_crop / rfft_crop)
  op         : + mix (+ freq SELU) + inverse  == the operator branch
  op+branch  : + conv branch + add + SELU
  block      : + conv_concat (full NeuralOperatorBlock)
plus conv_in / conv1 / output tail and the whole model for both
transform types.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.models.architectures import (
    NeuralOperatorBlock)
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.ops.spectral import (
    dht_crop, dht_pad_inverse, rfft_crop, rfft_pad_inverse)
from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

MODES = (10, 14, 14)
GRID = (1, 120, 120, 77, 24)    # channels-last tower grid at bench shape
FULL = (1, 4, 240, 240, 155)


def main():
    spectral.set_fp32_transform_precision("high")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(GRID).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def t(name, fn, v=x, **kw):
        ms = timed_loop_ms(fn, v, n_short=1, n_long=9, repeats=3, **kw)
        print(f"{name:28s} {ms:8.3f} ms", flush=True)
        return ms

    w = jax.random.normal(key, (24, 24)) * 0.1

    # --- Hartley stages
    t("H fwd (dht_crop)", lambda v: dht_crop(v, MODES))
    t("H op (fwd+mix+selu+inv)", lambda v: dht_pad_inverse(
        jax.nn.selu(jnp.einsum("...i,oi->...o", dht_crop(v, MODES), w)),
        GRID[1:-1]))

    # --- Fourier stages
    t("F fwd (rfft_crop)", lambda v: sum(
        jnp.sum(p) for p in rfft_crop(v, MODES)))
    def f_op(v):
        re, im = rfft_crop(v, MODES)
        yre = jnp.einsum("...i,oi->...o", re, w)
        yim = jnp.einsum("...i,oi->...o", im, w)
        return rfft_pad_inverse(yre, yim, GRID[1:-1])
    t("F op (fwd+mix+inv)", f_op)

    # --- whole blocks
    for tt in ("Hartley", "Fourier"):
        blk = NeuralOperatorBlock(24, 24, MODES, tt)
        p = blk.init(key, x)["params"]
        t(f"{tt} block (full)", lambda v, b=blk, pp=p: b.apply(
            {"params": pp}, v))

    # --- whole models
    for tt, ref in (("Fourier", 280.0), ("Hartley", 360.0)):
        m = models.NeuralOperatorSeg(4, 4, 24, 24, MODES, tt)
        xf = jnp.asarray(rng.standard_normal(FULL).astype(np.float32))
        p = m.init(key, jnp.zeros_like(xf))["params"]
        ms = t(f"{tt} model (24 blocks)",
               lambda v, mm=m, pp=p: mm.apply({"params": pp}, v), v=xf)
        print(f"    -> {ref / ms:.2f}x V100")


if __name__ == "__main__":
    main()
