"""Where do the fp32-'high' tower families spend their ~2.6 ms/block?

VERDICT r3 item 2: FNOSeg fp32-'high' sits at 62.4 ms (4.5x V100) —
the zoo's floor. The module path's per-block volume-scale traffic at
the bench tower grid (120, 120, 77) x 24ch is ~106 MB/pass; at the
relay's ~230 GB/s a pass costs ~0.46 ms, so the measured ~2.6 ms/block
is ~5.6 passes. This tool attributes them by measurement:

  * whole-model timings at num_transform_blocks in {1, 3, 6, 12, 24}
    -> linear fit gives the IN-JIT marginal cost per block (standalone
    sub-op rows pay the channels-last jit-boundary lane tax, DESIGN §3d,
    and overstate);
  * standalone sub-op rows (transform pair, conv, ccna) for shape only;
  * the optimized TPU HLO of a 1-block model dumped to /tmp so the
    volume-scale fusions can be counted exactly.

Run ON THE TPU:   python tools/profile_tower_fp32.py
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.ops.operators import (
    FourierOperator, HartleyOperator)
from multimodal_3d_image_segmentation_tpu.ops.convs import (
    ConcatConvNormAct, Conv)
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms)

FULL = (1, 4, 240, 240, 155)
MODES = (10, 14, 14)
C = 24
BLOCK_COUNTS = (1, 3, 6, 12, 24)


def t(name, fn, v, **kw):
    ms = timed_loop_ms(fn, v, n_short=1, n_long=5, repeats=3, **kw)
    print(f"{name:36s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    enable_compilation_cache()
    spectral.set_fp32_transform_precision("high")
    rng = np.random.default_rng(0)
    x_full = jnp.asarray(rng.standard_normal(FULL).astype(np.float32))

    sizes = tuple((s - 2) // 2 + 1 for s in FULL[2:])
    d, h, w = sizes
    x_grid = jnp.asarray(  # channels-last, the module path's layout
        rng.standard_normal((1, d, h, w, C)).astype(np.float32) * 0.1)
    unit_ms = x_grid.nbytes / 230e9 * 1e3
    print(f"tower grid {sizes}, volume tensor {x_grid.nbytes / 1e6:.0f} MB"
          f" -> 1 pass @230GB/s = {unit_ms:.3f} ms", flush=True)

    # pure elementwise pass = the measured bandwidth unit (pays the
    # jit-boundary lane tax like every standalone row below)
    t("elementwise (1R+1W)", lambda v: v * 1.0001 + 0.5, x_grid)

    for transform in ("Fourier", "Hartley"):
        print(f"--- {transform} fp32-'high'", flush=True)

        # whole-model sweep over block count -> marginal per-block cost
        ms_by_blocks = {}
        for nb in BLOCK_COUNTS:
            model = models.NeuralOperatorSeg(4, 4, C, nb, MODES, transform)
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros_like(x_full))["params"]
            ms = t(f"model nb={nb:2d}",
                   lambda v, m=model, p=params:
                   m.apply({"params": p}, v), x_full)
            ms_by_blocks[nb] = ms
            if nb == 1:
                lowered = jax.jit(
                    lambda v, m=model, p=params:
                    m.apply({"params": p}, v)).lower(x_full)
                hlo = lowered.compile().as_text()
                path = f"/tmp/hlo_{transform.lower()}_b1.txt"
                with open(path, "w") as f:
                    f.write(hlo)
                print(f"  [optimized TPU HLO (nb=1) -> {path}, "
                      f"{len(hlo) / 1e6:.1f} MB]", flush=True)
        xs = np.array(sorted(ms_by_blocks))
        ys = np.array([ms_by_blocks[n] for n in xs])
        slope, intercept = np.polyfit(xs, ys, 1)
        print(f"  marginal {slope:.3f} ms/block "
              f"(= {slope / unit_ms:.2f} volume passes), "
              f"entry/exit+head/tail {intercept:.2f} ms", flush=True)

        # standalone sub-ops (shape only: each pays the lane tax once)
        op_cls = FourierOperator if transform == "Fourier" \
            else HartleyOperator
        op = op_cls(C, C, MODES, use_bias=False)
        opp = op.init(jax.random.PRNGKey(2), x_grid)["params"]
        t("op branch (T+mix+iT)",
          lambda v: op.apply({"params": opp}, v), x_grid)

        if transform == "Fourier":
            fwd = lambda v: spectral.rfft_crop(v, MODES)  # noqa: E731
        else:
            fwd = lambda v: spectral.dht_crop(v, MODES)   # noqa: E731
        t("forward transform", fwd, x_grid)

        conv = Conv(C, 1, use_bias=False)
        cp = conv.init(jax.random.PRNGKey(3), x_grid)["params"]
        t("conv_branch 1x1", lambda v: conv.apply({"params": cp}, v),
          x_grid)

        ccna = ConcatConvNormAct(C, use_bias=True, activation="selu",
                                 use_snn=True)
        ccp = ccna.init(jax.random.PRNGKey(4), (x_grid, x_grid))["params"]
        t("ccna (2 reads + 1 write)",
          lambda v: ccna.apply({"params": ccp}, (v, v)), x_grid)


if __name__ == "__main__":
    main()
