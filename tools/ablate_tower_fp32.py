"""Attribute the FNOSeg fp32-'high' per-block cost by ablation (TPU).

VERDICT r4 item 2 carry-over: FNOSeg fp32-'high' is the zoo's slowest
ratio (51.9 ms = 5.4x V100 vs the 8x bar = 35 ms). The nb-sweep profiler
(tools/profile_tower_fp32.py) measured the module path's marginal cost
at 1.90 ms/block (Fourier) / 1.50 (Hartley) with a ~6.3 ms intercept —
so hitting 35 ms needs <=1.2 ms/block. This tool decomposes the 1.90 ms
by timing CHAINS of raw NeuralOperatorBlock modules at the tower grid
(121x121x78, C=24 channels-last — exactly the in-model layout) and
taking the nb=2 -> nb=8 marginal under ablations:

  * transform precision DEFAULT / HIGH / HIGHEST at fp32 activations:
    isolates the MXU-pass multiplier of the 'high' (bf16x3) dots;
  * use_conv_branch=False: the parallel 1x1 branch's true in-jit cost;
  * use_block_concat=False (skip as add): the ConcatConvNormAct tail;
  * use_block_skip=False: tail removed entirely;
  * bf16 activations: the memory-bound reference point.

Ablations change semantics — profiling only, never routed. Reference
structure: /root/reference/nets/architectures.py:511-608.

Run ON THE TPU:  python tools/ablate_tower_fp32.py [Fourier|Hartley]
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu.models.architectures import (
    NeuralOperatorBlock)
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms)

GRID = (1, 121, 121, 78, 24)   # the flagship-bench tower grid, ch-last
MODES = (10, 14, 14)
C = GRID[-1]
NB_LO, NB_HI = 2, 8


def chain_marginal(transform, precision="high", dtype=jnp.float32,
                   packed_mix=False, **block_kw):
    spectral.set_fp32_transform_precision(
        precision if dtype == jnp.float32 else "highest")
    spectral.set_packed_mix(packed_mix)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(GRID).astype(np.float32) * .1,
                    dtype=dtype)
    ms = {}
    for nb in (NB_LO, NB_HI):
        block = NeuralOperatorBlock(C, C, MODES, transform, **block_kw)
        keys = jax.random.split(jax.random.PRNGKey(0), nb)
        plist = [block.init(k, jnp.zeros(GRID, dtype))["params"]
                 for k in keys]

        def run(v, b=block, ps=plist):
            for p in ps:
                v = b.apply({"params": p}, v)
            return v

        ms[nb] = timed_loop_ms(run, x, n_short=1, n_long=5, repeats=3)
    return ms, (ms[NB_HI] - ms[NB_LO]) / (NB_HI - NB_LO)


def main():
    enable_compilation_cache()
    transforms = sys.argv[1:] or ["Fourier"]
    grid_mb = np.prod(GRID) * 4 / 1e6
    print(f"full-grid tensor {grid_mb:.0f} MB; pass @230GB/s = "
          f"{grid_mb / 230e3 * 1e3:.3f} ms", flush=True)
    cases = [
        ("base 'high'", dict(precision="high")),
        ("prec DEFAULT (1-pass bf16 dots)", dict(precision="default")),
        ("prec HIGHEST (bf16x6 dots)", dict(precision="highest")),
        ("no conv_branch", dict(precision="high", use_conv_branch=False)),
        ("skip as add (no ccna)", dict(precision="high",
                                       use_block_concat=False)),
        ("no block skip", dict(precision="high", use_block_skip=False)),
        ("bf16 activations", dict(dtype=jnp.bfloat16)),
        # single-pass [hi;hi;lo] packed K=24 tail mixes (conv branch +
        # ccna parts) instead of XLA's HIGH hi/lo-split 3-dot lowering
        ("packed tail mixes @'high'", dict(precision="high",
                                           packed_mix=True)),
    ]
    for transform in transforms:
        print(f"--- {transform} block chains, nb {NB_LO}->{NB_HI} "
              f"marginal", flush=True)
        for name, kw in cases:
            try:
                ms, slope = chain_marginal(transform, **kw)
                print(f"{name:36s} nb{NB_LO}={ms[NB_LO]:7.2f} "
                      f"nb{NB_HI}={ms[NB_HI]:7.2f} "
                      f"-> {slope:6.3f} ms/block", flush=True)
            except Exception as e:
                print(f"{name:36s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    spectral.set_fp32_transform_precision("highest")
    spectral.set_packed_mix(False)


if __name__ == "__main__":
    main()
