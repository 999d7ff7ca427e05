"""A/B: fused resize+softmax tail kernel (kernels/tail_resize.py) vs the
module tail (matmul trilinear + padcrop + softmax), ON THE TPU.

Three measurements (ROADMAP r5 open-queue #1, DESIGN §3d.1: tail floor
~1.2 ms vs 3.13 ms measured):
  1. numerics: fused vs module tail max|diff| at the flagship tail shape
  2. standalone tail timing at the V-Net/HNOSeg-XS flagship tail shape
  3. whole-model A/B: HNOSeg-XS (bench config) and V-Net-DS flagship
     with M3SEG_PALLAS_TAIL=0 vs =1 (env read at trace time; each arm
     traces fresh).

Chained-loop timing; run ON THE TPU, one process at a time.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.kernels.tail_resize import (
    fused_tail_softmax)
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.ops.padcrop import spatial_padcrop
from multimodal_3d_image_segmentation_tpu.ops.resize import resize_linear
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms, timed_loop_pairs_ms)

enable_compilation_cache()
rng = np.random.default_rng(0)

IMAGE = (240, 240, 155)
TAIL_IN = (1, 4, 121, 121, 78)   # V-Net / HNOSeg-XS top-grid tail input


def arr(shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                       * scale)


def module_tail(x):
    y = resize_linear(x, IMAGE, channel_first=True)
    y = spatial_padcrop(y, IMAGE, channel_first=True)
    return jax.nn.softmax(y, axis=1)


def fused_tail(x):
    return fused_tail_softmax(x, IMAGE, jnp.float32, False)


def main():
    x = arr(TAIL_IN)

    # ---- 1. numerics -----------------------------------------------------
    want = np.asarray(jax.jit(module_tail)(x))
    got = np.asarray(jax.jit(fused_tail)(x))
    diff = float(np.abs(got - want).max())
    print(f"numerics max|diff| fused vs module tail: {diff:.3e}",
          flush=True)

    # ---- 2. standalone tail timing ---------------------------------------
    t_mod = timed_loop_ms(module_tail, x, n_short=2, n_long=10, repeats=3)
    print(f"module tail   {TAIL_IN} -> {IMAGE}: {t_mod:7.3f} ms",
          flush=True)
    t_fus = timed_loop_ms(fused_tail, x, n_short=2, n_long=10, repeats=3)
    print(f"fused tail    {TAIL_IN} -> {IMAGE}: {t_fus:7.3f} ms",
          flush=True)

    # ---- 3. whole-model A/B ----------------------------------------------
    spectral.set_fp32_transform_precision("high")
    xin = arr((1, 4) + IMAGE)

    def run_model(tag, model):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros_like(xin))["params"]
        outs = {}
        for mode in ("0", "1"):
            os.environ["M3SEG_PALLAS_TAIL"] = mode
            fn = lambda v: model.apply({"params": params}, v)  # noqa: E731
            ms = timed_loop_pairs_ms(fn, xin, n_short=2, n_long=10,
                                     repeats=4)
            outs[mode] = ms
            print(f"{tag} tail={'module' if mode == '0' else 'fused '}"
                  f": {ms:7.3f} ms", flush=True)
        # numerics between the arms at full model level
        os.environ["M3SEG_PALLAS_TAIL"] = "0"
        y0 = np.asarray(jax.jit(
            lambda v: model.apply({"params": params}, v))(xin))
        os.environ["M3SEG_PALLAS_TAIL"] = "1"
        y1 = np.asarray(jax.jit(
            lambda v: model.apply({"params": params}, v))(xin))
        print(f"{tag} model-level max|diff|: "
              f"{float(np.abs(y1 - y0).max()):.3e}", flush=True)
        del params
        return outs

    hxs = models.HNOSegXS(in_channels=4, out_channels=4, filters=24,
                          num_transform_blocks=[3] * 8,
                          num_modes=(10, 14, 14), use_pallas=True)
    run_model("HNOSegXS(bench)", hxs)

    vnet = models.VNetDS(in_channels=4, out_channels=4,
                         base_num_filters=24, num_blocks=[1, 2, 3, 3, 3],
                         right_leg_indexes=[0, 1, 2, 3, 4],
                         use_pallas=True)
    run_model("VNetDS(flagship)", vnet)


if __name__ == "__main__":
    main()
