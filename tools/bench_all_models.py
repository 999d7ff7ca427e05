"""Full-resolution inference benchmark for every model family, vs the
reference's published V100 numbers (reference README Fig. 1):
HNOSeg-XS ~0.20-0.24 s, FNOSeg ~0.28 s, HNOSeg ~0.36 s, V-Net-DS ~0.33 s.

Each family is measured at its SHIPPED config (``configs/*.ini``) plus
the informational variants the README cites. Row labels state the code
path actually exercised: at fp32, ``use_pallas`` on FNOSeg/HNOSeg
serves the XLA module path (the fused tower kernel is gated to bf16 —
docs/DESIGN.md §8b), so those families get one fp32 row; HartleyMHA
(where the fused kernel wins at fp32 'high' too) gets fused-vs-module
fp32 rows; every family gets a bf16 row.

``--artifact`` additionally writes ``BENCH_ZOO.json`` at the repo root so
every README model-zoo claim is regenerable from a committed artifact:

    python tools/bench_all_models.py --artifact
"""
import json
import os
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

SHAPE = (1, 4, 240, 240, 155)
V100 = {"HNOSeg-XS": 240, "FNOSeg": 280, "HNOSeg": 360, "V-Net-DS": 330,
        "HartleyMHA": None}


def _builders():
    return {
        "HNOSeg-XS": lambda **kw: models.HNOSegXS(
            4, 4, 24, [3] * 8, (10, 14, 14), **kw),
        "FNOSeg": lambda **kw: models.NeuralOperatorSeg(
            4, 4, 24, 24, (10, 14, 14), "Fourier", **kw),
        "HNOSeg": lambda **kw: models.NeuralOperatorSeg(
            4, 4, 24, 24, (10, 14, 14), "Hartley", **kw),
        "V-Net-DS": lambda **kw: models.VNetDS(
            4, 4, 24, [1, 2, 3, 3, 3],
            right_leg_indexes=[0, 1, 2, 3, 4], **kw),
        "HartleyMHA": lambda **kw: models.HartleyMHASeg(
            4, 4, 24, 16, 4, (8, 12, 12), 2, **kw),
    }


# (family, variant-label, builder, kwargs[, transform-precision]).
# The first row per family is the shipped configuration; labels name the
# code path actually measured.
def _rows():
    b = _builders()
    bf16 = dict(use_pallas=True, compute_dtype="bfloat16")
    # 'mixed': bf16 activations + fp32 weight/matrix islands
    # (ops/spectral.set_bf16_exact via the _mixed pseudo-kwarg)
    mixed = dict(use_pallas=True, compute_dtype="bfloat16", _mixed=True)
    rows = [
        ("HNOSeg-XS", "fp32_high_pallas", b["HNOSeg-XS"],
         dict(use_pallas=True)),
        ("HNOSeg-XS", "fp32_highest_pallas", b["HNOSeg-XS"],
         dict(use_pallas=True), "highest"),
        ("HNOSeg-XS", "bf16_pallas", b["HNOSeg-XS"], bf16),
        ("HNOSeg-XS", "mixed_pallas", b["HNOSeg-XS"], mixed),
    ]
    for fam in ("FNOSeg", "HNOSeg"):
        # the tower families serve the XLA module tower at every dtype
        # since the round-3 routing flip (docs/DESIGN.md §8b); with
        # use_pallas their entry conv + resize run the Pallas conv_in /
        # matmul-resize path (round 4), hence the label
        rows.append((fam, "fp32_high_module_pallas_entry", b[fam],
                     dict(use_pallas=True)))
        rows.append((fam, "bf16_module_pallas_entry", b[fam], bf16))
        rows.append((fam, "mixed_module_pallas_entry", b[fam], mixed))
    rows += [
        ("HartleyMHA", "fp32_high_fused_pallas", b["HartleyMHA"],
         dict(use_pallas=True)),
        ("HartleyMHA", "fp32_high_module", b["HartleyMHA"], dict()),
        # bf16 MHA routes the module tower (+ Pallas entry) since the
        # round-4 re-check (module 26.7 < fused 39.7 ms)
        ("HartleyMHA", "bf16_module_pallas_entry", b["HartleyMHA"], bf16),
        ("HartleyMHA", "bf16_module", b["HartleyMHA"],
         dict(compute_dtype="bfloat16")),
        ("HartleyMHA", "mixed_module_pallas_entry", b["HartleyMHA"],
         mixed),
        ("V-Net-DS", "fp32_high_flat_pallas", b["V-Net-DS"],
         dict(use_pallas=True)),
        ("V-Net-DS", "bf16_flat_pallas", b["V-Net-DS"], bf16),
        ("V-Net-DS", "mixed_flat_pallas", b["V-Net-DS"], mixed),
    ]
    return rows


def _compiled_hbm_mib(fn, x):
    """Compile-time HBM budget (MiB) of the per-volume executable:
    argument (params + input) + output + temp sizes from XLA's memory
    analysis. Returns None where the backend has no memory analysis."""
    try:
        ma = jax.jit(fn).lower(x).compile().memory_analysis()
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes)
        return round(total / 1024 ** 2, 1)
    except Exception:
        return None


def main(artifact=False, family=None):
    from multimodal_3d_image_segmentation_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    # fp32 rows run serving precision ('high') for the fp32 transform
    # matmuls — measure what the shipped configs give users
    from multimodal_3d_image_segmentation_tpu.ops import spectral
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    rows = []
    for name, variant, build, kw, *prec in _rows():
        if family is not None and name != family:
            continue
        spectral.set_fp32_transform_precision(prec[0] if prec else "high")
        kw = dict(kw)
        spectral.set_bf16_exact(kw.pop("_mixed", False))
        try:
            model = build(**kw)
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros_like(x))["params"]
            n_params = sum(int(np.prod(p.shape))
                           for p in jax.tree_util.tree_leaves(params))
            fn = lambda v: model.apply({"params": params}, v)  # noqa: E731
            ms = timed_loop_ms(fn, x, n_short=1, n_long=4, repeats=3)
            ref = V100.get(name)
            vs = f"{ref / ms:5.1f}x V100" if ref else "   (n/a)"
            # reference Fig. 1's second axis is GPU memory. This relay
            # exposes NO runtime memory stats (memory_stats() is None;
            # heap profiles fatally abort), so record the COMPILE-TIME
            # HBM budget of the per-volume executable instead:
            # arguments (params + input) + output + XLA temp arena —
            # a true per-model, deterministic number.
            hbm_mib = _compiled_hbm_mib(fn, x)
            print(f"{name:11s} {variant:18s} {n_params/1e6:8.3f}M  "
                  f"{ms:8.2f} ms/volume  {1000/ms:7.1f} vol/s  {vs}  "
                  f"hbm {hbm_mib if hbm_mib is not None else '?':>7} MiB",
                  flush=True)
            rows.append({
                "model": name,
                "variant": variant,
                "params": n_params,
                "ms_per_volume": round(ms, 2),
                "volumes_per_sec": round(1000.0 / ms, 2),
                "v100_ms": ref,
                "vs_v100": round(ref / ms, 2) if ref else None,
                "hbm_mib_compiled": hbm_mib,
            })
        except Exception as e:
            print(f"{name:11s} {variant:18s} FAILED: "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            rows.append({"model": name, "variant": variant,
                         "error": f"{type(e).__name__}"})
        if artifact:  # incremental: survive a later-row crash
            _write(rows, merge=family is not None)
    if artifact:
        # the final write of a --family rerun carries the COMPLETE fresh
        # variant set for that family, so stale (renamed/removed) variant
        # rows can be dropped from the committed artifact
        _write(rows, final=True, merge=family is not None,
               drop_stale_for=family)


def _write(rows, final=False, merge=False, drop_stale_for=None):
    out = {
        "shape": list(SHAPE),
        "protocol": "chained fori_loop, per-volume median "
                    "(utils/profiling.timed_loop_ms); fp32 rows at "
                    "serving precision 'high'; first row per family = "
                    "the shipped config; hbm_mib_compiled = XLA "
                    "memory_analysis of the per-volume executable "
                    "(arguments + output + temp + code; this relay "
                    "exposes no runtime memory stats)",
        "device": str(jax.devices()[0]),
        "models": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_ZOO.json")
    if merge and os.path.exists(path):
        # family-filtered rerun: update matching rows in place, keep the
        # rest of the committed artifact, preserve row order
        with open(path) as f:
            existing = json.load(f)["models"]
        fresh = {(r["model"], r["variant"]): r for r in rows}
        fresh_variants = {r["variant"] for r in rows}
        merged = []
        for r in existing:
            if (drop_stale_for is not None
                    and r["model"] == drop_stale_for
                    and r["variant"] not in fresh_variants):
                print(f"dropping stale row {r['model']}/{r['variant']} "
                      "(variant absent from the fresh rerun)")
                continue
            merged.append(fresh.pop((r["model"], r["variant"]), r))
        # new variants slot in after their family's last existing row
        for (name, _), r in fresh.items():
            idx = max((i for i, e in enumerate(merged)
                       if e["model"] == name), default=len(merged) - 1)
            merged.insert(idx + 1, r)
        out["models"] = merged
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    if final:
        print(f"wrote {path}")


if __name__ == "__main__":
    fam = None
    if "--family" in sys.argv[1:]:
        fam = sys.argv[sys.argv.index("--family") + 1]
    main(artifact="--artifact" in sys.argv[1:], family=fam)
