"""Whole-model fused-tower timing at the current ``M3SEG_TOWER_P``
(kernels/tower_block._pick_p override). Run once per P value, each in a
fresh process (one TPU process at a time):

    for P in 8 16 24; do M3SEG_TOWER_P=$P python tools/sweep_tower_p.py; done

Informs the plane-batch choice for the bf16 fused towers (docs/ROADMAP.md
"raise P" idea). bf16 only — the fp32-'high' routing serves the module
path for the tower families (docs/DESIGN.md section 8b).
"""
import os
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms)

FULL = (1, 4, 240, 240, 155)
MODES = (10, 14, 14)


def main():
    enable_compilation_cache()
    spectral.set_fp32_transform_precision("high")
    # this sweep measures the FUSED path explicitly (routing now defaults
    # to the module path after the round-3 re-measurement flip)
    from multimodal_3d_image_segmentation_tpu.models import architectures
    architectures.set_fused_tower(True)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(FULL).astype(np.float32))
    p = os.environ.get("M3SEG_TOWER_P", "(default)")
    for transform in ("Fourier", "Hartley"):
        model = models.NeuralOperatorSeg(
            4, 4, 24, 24, MODES, transform,
            compute_dtype="bfloat16", use_pallas=True)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))[
            "params"]
        ms = timed_loop_ms(
            lambda v, m=model, pr=params: m.apply({"params": pr}, v),
            x, n_short=1, n_long=5, repeats=3)
        print(f"P={p:>9s} {transform:8s} bf16 fused: {ms:8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
