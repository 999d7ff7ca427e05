"""Benchmark: HNOSeg-XS full-resolution BraTS'23 inference throughput.

Protocol mirrors the reference (``experiments/train_test.py:384-426``):
per-volume time on 240x240x155 volumes, compile excluded. Baseline: the
published V100 number for HNOSeg-XS inference is < 0.24 s/volume
(reference ``README.md:10``, Fig. 1 ~0.20 s).

Measurement note: remote-tunnel PJRT backends can make per-dispatch
wall-clock timing unreliable (async dispatch; completion only observable at
host readback). We therefore time K model evaluations chained inside ONE
jitted ``lax.fori_loop`` (loop-carried data dependency prevents hoisting),
force completion with a scalar readback, and difference two loop lengths to
cancel the fixed dispatch/readback overhead.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
with value = volumes/sec/chip and vs_baseline = speedup over the 0.24 s
V100 reference.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_SECONDS_PER_VOLUME = 0.24  # V100, reference README.md:10
SHAPE = (1, 4, 240, 240, 155)       # BraTS'23 full resolution
N_SHORT = 2
N_LONG = 12
REPEATS = 5


def main(_retries=2):
    """One transparent retry on transient relay errors (the remote-compile
    tunnel occasionally drops a request; the driver runs this unattended).
    Deterministic failures (bugs, bad configs) re-raise immediately."""
    try:
        _main()
    except (ValueError, TypeError, AssertionError, KeyError,
            AttributeError, ImportError):
        raise
    except Exception:
        if _retries <= 0:
            raise
        time.sleep(20)
        main(_retries - 1)


def _main():
    from multimodal_3d_image_segmentation_tpu.utils.profiling import (
        enable_compilation_cache, timed_loop_pairs_ms)
    enable_compilation_cache()
    from multimodal_3d_image_segmentation_tpu import models
    from multimodal_3d_image_segmentation_tpu.ops import spectral

    # fp32 activations with the Pallas kernels and fp32 transform matmuls
    # at bf16x3 MXU precision ("high"): per-transform CPU-vs-TPU relative
    # error 3e-5 (vs 4e-7 at "highest"), whole-model argmax agreement
    # 99.98%, Dice impact far below the 0.1% parity bar -- the shipped
    # serving configuration (configs/config_hnoseg_xs.ini). bfloat16
    # compute_dtype gives a further ~1.8x.
    spectral.set_fp32_transform_precision("high")
    model = models.HNOSegXS(
        in_channels=4, out_channels=4, filters=24,
        num_transform_blocks=[3] * 8, num_modes=(10, 14, 14),
        use_pallas=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]

    # chained-pair protocol with the relay-hiccup guard lives in
    # utils/profiling.timed_loop_pairs_ms (shared with the tools)
    ms = timed_loop_pairs_ms(
        lambda v: model.apply({"params": params}, v), x,
        n_short=N_SHORT, n_long=N_LONG, repeats=REPEATS)
    sec_per_volume = ms / 1e3
    volumes_per_sec = 1.0 / sec_per_volume
    vs_baseline = BASELINE_SECONDS_PER_VOLUME / sec_per_volume

    print(json.dumps({
        "metric": "hnoseg_xs_brats23_240x240x155_inference_volumes_per_sec",
        "value": round(volumes_per_sec, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
