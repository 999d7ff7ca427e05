"""Per-stage cost breakdown of the FUSED tower path (bf16 serving mode)
at bench shape: where does each block's time go — the Pallas kernel
itself vs the XLA spectrum stages between kernels vs entry/exit?

Informs the next fusion decision (docs/ROADMAP.md): moving the D-stages
into the kernel pays only if the XLA `block_spectrum_update` + the f/z
HBM round trips are a material share of the ~1.44 ms/block total.

Stages (per transform type, bf16):
  model_fused   : whole model, fused path (use_pallas, bf16)
  model_module  : whole model, module path (bf16) — the routing baseline
  kernel        : one fused_tower_block pallas_call (x, z -> out, f)
  spec_update   : block_spectrum_update (f -> z): D-fwd + mix (+SELU) + D-inv
  entry_hw      : entry_forward_hw (volume -> per-plane partial spectra)

Run on the TPU:  python tools/profile_tower_fused.py
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.kernels import tower_block as tb
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms)

FULL = (1, 4, 240, 240, 155)
MODES = (10, 14, 14)
C = 24


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape).astype(dtype) * 0.1


def main():
    enable_compilation_cache()
    spectral.set_fp32_transform_precision("high")
    rng = np.random.default_rng(0)
    x_full = jnp.asarray(rng.standard_normal(FULL).astype(np.float32))
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # tower grid of the bench shape after the k=2/s=2 entry conv
    sizes = tuple((s - 2) // 2 + 1 for s in FULL[2:])
    d, h, w = sizes
    npl = w * tb._ceil128(h)

    def t(name, fn, v, **kw):
        ms = timed_loop_ms(fn, v, n_short=1, n_long=5, repeats=3, **kw)
        print(f"{name:34s} {ms:8.3f} ms", flush=True)
        return ms

    print(f"tower grid {sizes}, npl={npl}, bf16", flush=True)
    for transform in ("Fourier", "Hartley"):
        print(f"--- {transform}", flush=True)
        spec = tb.make_tower_spec(transform, sizes, MODES, C, n_ds=0)

        # whole model: fused vs module (both bf16). Routing defaults to
        # the module path since the round-3 flip; force it per row.
        from multimodal_3d_image_segmentation_tpu.models import (
            architectures)
        for label, kw, fused in (
                ("model_fused", dict(use_pallas=True), True),
                ("model_module", dict(use_pallas=False), False)):
            model = models.NeuralOperatorSeg(
                4, 4, C, 24, MODES, transform,
                compute_dtype="bfloat16", **kw)
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros_like(x_full))["params"]
            architectures.set_fused_tower(fused)
            try:
                t(f"{label:22s}",
                  lambda v, m=model, p=params: m.apply({"params": p}, v),
                  x_full)
            finally:
                architectures.set_fused_tower(None)

        # one kernel call (x, z -> out, f). z rides bf16 like the model's.
        x_flat = _rand(key, (d, C, npl), dt)
        z = _rand(key, (d, 2, C, spec.kh, spec.kwl), dt)
        w_cat = _rand(key, (2 * C, C), jnp.float32)
        w_cc_t = _rand(key, (C, C), jnp.float32)
        b_cat = _rand(key, (2 * C,), jnp.float32)
        t("kernel (per block)",
          lambda v: tb.fused_tower_block(v, z, w_cat, w_cc_t, b_cat,
                                         spec, False)[0], x_flat)

        # XLA spectrum stage between kernels (f -> z); f rides the
        # volume dtype as routed (bf16 carry since commit 3eb3a89)
        f = _rand(key, (d, 2, C, spec.kh, spec.kwl), dt)
        if transform == "Hartley":
            op = (_rand(key, (C, C), jnp.float32),)
        else:
            op = (_rand(key, (C, C), jnp.float32),
                  _rand(key, (C, C), jnp.float32))
        t("spec_update (per block)",
          lambda v: tb.block_spectrum_update(v, op, spec).astype(dt), f)

        # entry H/W forward of the whole volume
        t("entry_hw", lambda v: tb.entry_forward_hw(v, spec), x_flat)


if __name__ == "__main__":
    main()
