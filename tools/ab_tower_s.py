"""A/B: fused tower kernel v5 (in-kernel depth stages, resident
spectrum — kernels/tower_block_s.py) vs v2 (f/z exchanged with XLA) at
bench shape, whole model. Run ON THE TPU:

    python tools/ab_tower_s.py

Rows per transform:
  bf16  v2 fused  : the currently-routed serving path
  bf16  v5 fused  : the candidate
  fp32  module    : the currently-routed fp32-'high' path
  fp32  v5 fused  : v5 removes the traffic + dispatch overhead that made
                    v2 lose at fp32 (79-86 vs 56 ms) — re-test the loss

The routing gate (tower_block_s.set_enabled) is read at trace time;
each timing builds a fresh jit, so one process measures everything.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.kernels import tower_block_s as tbs
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms)

FULL = (1, 4, 240, 240, 155)
MODES = (10, 14, 14)


def main():
    enable_compilation_cache()
    spectral.set_fp32_transform_precision("high")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(FULL).astype(np.float32))

    def t(name, model, params):
        ms = timed_loop_ms(
            lambda v: model.apply({"params": params}, v), x,
            n_short=1, n_long=5, repeats=3)
        print(f"{name:42s} {ms:8.2f} ms/volume", flush=True)
        return ms

    # fused rows need the explicit opt-in since the round-3 routing flip
    from multimodal_3d_image_segmentation_tpu.models import architectures
    architectures.set_fused_tower(True)

    for transform in ("Fourier", "Hartley"):
        print(f"--- {transform}", flush=True)
        mk = lambda **kw: models.NeuralOperatorSeg(  # noqa: E731
            4, 4, 24, 24, MODES, transform, **kw)

        mb = mk(use_pallas=True, compute_dtype="bfloat16")
        pb = mb.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
        tbs.set_enabled(False)
        t(f"{transform} bf16 fused v2", mb, pb)
        tbs.set_enabled(True)
        t(f"{transform} bf16 fused v5", mb, pb)

        mf = mk(use_pallas=False)
        pf = mf.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
        t(f"{transform} fp32-high module", mf, pf)
        # fp32 v5: force the fused route (normally bf16-gated)
        mf5 = mk(use_pallas=True)
        orig = type(mf5)._use_fused_tower
        type(mf5)._use_fused_tower = (
            lambda self, v: self.use_pallas and v.shape[0] == 1)
        try:
            t(f"{transform} fp32-high fused v5", mf5, pf)
        finally:
            type(mf5)._use_fused_tower = orig
        tbs.set_enabled(None)

        # numerics spot check: v5 bf16 vs module bf16 at full shape
        tbs.set_enabled(True)
        got = mb.apply({"params": pb}, x)
        tbs.set_enabled(None)
        want = mk(compute_dtype="bfloat16").apply({"params": pb}, x)
        diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - want.astype(jnp.float32))))
        agree = float(jnp.mean((jnp.argmax(got, 1)
                                == jnp.argmax(want, 1)).astype(jnp.float32)))
        print(f"{transform} bf16 v5-vs-module: maxdiff={diff:.2e} "
              f"argmax-agree={agree:.5f}", flush=True)

    # --- HartleyMHA (fused routed at fp32-'high' AND bf16)
    print("--- HartleyMHA", flush=True)
    mha = lambda **kw: models.HartleyMHASeg(  # noqa: E731
        4, 4, 24, 16, 4, (8, 12, 12), 2, **kw)
    for label, kw in (("fp32-high", dict(use_pallas=True)),
                      ("bf16", dict(use_pallas=True,
                                    compute_dtype="bfloat16"))):
        m = mha(**kw)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
        tbs.set_enabled(False)
        t(f"HartleyMHA {label} fused v2", m, p)
        tbs.set_enabled(True)
        t(f"HartleyMHA {label} fused v5", m, p)
        tbs.set_enabled(None)


if __name__ == "__main__":
    main()
