"""Attribution proto for the fp32-'high' fused tower block (VERDICT r4 #1).

DESIGN §8c proved no module-schedule restructuring reaches the 1.2 ms/block
needed for FNOSeg fp32 at 8x V100; the one untested lever is a streaming
Pallas block that pays the bf16x3 hi/lo splits once in VMEM. The round-3
v2 fused kernel (kernels/tower_block.py) IS that shape (1 read + 1 write
of the volume, in-VMEM packing) yet measured 2.61 ms/block fp32 against a
~1.2 ms operand-set DMA floor. Before building any v6: decompose where
v2's time goes, with cumulative kernel variants at the exact tower grid:

  copy        : DMA floor of the v2 operand set (x, z in; out, f out)
  +tail pack  : + the two packed-K channel-mix dots ([hi;hi;lo] concat)
  +tail 3dot  : same tail as three K=24 dots on the split halves
                (no 1.5x VMEM concat copy)           -> packing cost
  +inverse    : + W-expand dot, corner turn, H-expand dots
  +inv nodot  : corner turn replaced by a broadcast of the right shape
                (garbage values, same dot shapes)    -> transpose cost
  +forward    : + H-contract dots, corner turn, W-contract dot (full v2)
  +fwd nodot  : forward corner turn replaced likewise
  v2 prod     : production fused_tower_block cross-check

All fp32 'high'-class (packed bf16x3), Fourier AND Hartley specs at the
BraTS flagship tower grid (121, 121, 78), C=24, modes (10, 14, 14).
Chained-loop timing (utils/profiling.timed_loop_ms).
"""
import functools
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_3d_image_segmentation_tpu.kernels.tower_block import (
    TowerSpec, make_tower_spec, _kernel_mats, _pack_weight, _kdot,
    _pack_operand, fused_tower_block)
from multimodal_3d_image_segmentation_tpu.kernels._common import (
    hi_lo as _hi_lo, selu as _selu)
from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms)

SIZES = (121, 121, 78)
MODES = (10, 14, 14)
C = 24


def _variant_kernel(x_ref, z_ref, wp1_ref, wp2_ref, bias_ref,
                    mwi_cs, mhi_a, mhi_b, mhf_hi, mhf_lo, mwf_cs, mrep,
                    out_ref, f_ref, *, spec: TowerSpec, p_planes: int,
                    tail: str, inverse: str, forward: str):
    """tail: 'off'|'packed'|'3dot'; inverse: 'off'|'on'|'noturn'|
    'turnfree'; forward: 'off'|'on'|'noturn'
    ('noturn' = corner turn replaced by a broadcast from the bias ref —
    same dot shapes, garbage values; 'turnfree' = the H-expand contracts
    KH as the SUBLANE dim via one batched dot_general against the
    per-batch-replicated [A]*C+[B]*C matrix stack — no transpose)."""
    c = spec.channels
    _, h, w = spec.sizes
    hl, kh, kwl = spec.hl, spec.kh, spec.kwl
    npl = w * hl

    def _plane(p, carry):
        x = x_ref[p]                                  # (C, NPL)

        # ---- inverse 2D (y1)
        if inverse == "off":
            y1 = x * bias_ref[0, 0]
        elif inverse == "turnfree":
            z = z_ref[p].reshape(2 * c * kh, kwl)
            ab = _kdot(_pack_operand(z, 1), mwi_cs[...])   # (2CKH, 2W)
            a = ab[:, :w].reshape(2, c, kh, w)
            b = ab[:, w:].reshape(2, c, kh, w)
            y = jnp.stack([a[0] - b[1], b[0] + a[1]])      # (2, C, KH, W)
            y2 = _pack_operand(y.reshape(2 * c, kh, w), 1)  # (2C, 3KH, W)
            yy = jax.lax.dot_general(
                y2, mrep[...], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (2C, W, HL)
            y1 = (yy[:c] + yy[c:]).reshape(c, npl)
        else:
            z = z_ref[p].reshape(2 * c * kh, kwl)
            ab = _kdot(_pack_operand(z, 1), mwi_cs[...])   # (2CKH, 2W)
            if inverse == "noturn":
                # garbage values, same dot shapes; sublane-only broadcast
                # (real Mosaic lacks both-dims broadcasts) of an ab slice
                # keeps the W-expand dot alive
                y = jnp.broadcast_to(ab[:1, :kh].reshape(1, 1, kh),
                                     (2, c * w, kh))
            else:
                a = ab[:, :w].reshape(2, c, kh, w)
                b = ab[:, w:].reshape(2, c, kh, w)
                y = jnp.stack([a[0] - b[1], b[0] + a[1]])
                y = jnp.swapaxes(y, 2, 3).reshape(2, c * w, kh)
            y1 = (_kdot(_pack_operand(y[0], 1), mhi_a[...])
                  + _kdot(_pack_operand(y[1], 1), mhi_b[...])
                  ).reshape(c, npl)

        # ---- tail
        if tail == "off":
            o = _selu(y1)
        else:
            if tail == "packed":
                xp = _pack_operand(x, 0)
                pq = _kdot(wp1_ref[...], xp)
            else:  # 3dot: reuse the hi/lo halves, no concat copy
                xhi, xlo = _hi_lo(x)
                w1 = wp1_ref[...]
                whi, wlo = w1[:, :c], w1[:, c:2 * c]   # [hi | lo | hi]
                pq = (_kdot(whi, xhi) + _kdot(wlo, xhi)
                      + _kdot(whi, xlo))
            pq = pq + bias_ref[...]
            t = _selu(y1 + pq[:c])
            if tail == "packed":
                tp = _pack_operand(t, 0)
                o = _selu(_kdot(wp2_ref[...], tp) + pq[c:])
            else:
                thi, tlo = _hi_lo(t)
                w2 = wp2_ref[...]
                w2hi, w2lo = w2[:, :c], w2[:, c:2 * c]
                o = _selu(_kdot(w2hi, thi) + _kdot(w2lo, thi)
                          + _kdot(w2hi, tlo) + pq[c:])
        out_ref[p] = o.astype(out_ref.dtype)

        # ---- forward 2D of o
        if forward == "off":
            f_ref[p] = z_ref[p]
        else:
            o2 = o.reshape(c, w, hl).reshape(c * w, hl)
            ohi, olo = _hi_lo(o2)
            fcs = (_kdot(ohi, mhf_hi[...]) + _kdot(ohi, mhf_lo[...])
                   + _kdot(olo, mhf_hi[...]))          # (CW, 2KH)
            if forward == "noturn":
                # lane-only broadcast of an fcs column: keeps the H dots
                fcs = jnp.broadcast_to(fcs[:c * 2 * kh, :1],
                                       (c * 2 * kh, w))
            else:
                fcs = fcs.reshape(c, w, 2 * kh)
                fcs = jnp.swapaxes(fcs, 1, 2).reshape(c * 2 * kh, w)
            gg = _kdot(_pack_operand(fcs, 1), mwf_cs[...])
            ga = gg[:, :kwl].reshape(c, 2, kh, kwl)
            gb = gg[:, kwl:].reshape(c, 2, kh, kwl)
            f_ref[p, 0] = (ga[:, 0] - gb[:, 1]).astype(f_ref.dtype)
            f_ref[p, 1] = (gb[:, 0] + ga[:, 1]).astype(f_ref.dtype)
        return carry

    jax.lax.fori_loop(0, p_planes, _plane, 0)


def run_variant(x_flat, z, wp1, wp2, bias, spec, p, interpret=False,
                **flags):
    d = spec.sizes[0]
    c, kh, kwl = spec.channels, spec.kh, spec.kwl
    npl = x_flat.shape[-1]
    mat_args = list(_kernel_mats(spec, True))
    # batched per-(component, channel) H-expand matrix stack for the
    # turn-free inverse: [A]*C + [B]*C, packed [hi; lo; hi] along KH
    mhi_a_p, mhi_b_p = np.asarray(mat_args[1]), np.asarray(mat_args[2])
    mrep = np.concatenate([
        np.broadcast_to(mhi_a_p, (c,) + mhi_a_p.shape),
        np.broadcast_to(mhi_b_p, (c,) + mhi_b_p.shape)], axis=0).copy()
    mat_args.append(mrep)
    kernel = functools.partial(_variant_kernel, spec=spec, p_planes=p,
                               **flags)

    def _full(m):
        return pl.BlockSpec(m.shape, lambda i, nd=m.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(d, p),),
        in_specs=[
            pl.BlockSpec((p, c, npl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 2, c, kh, kwl), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full(wp1), _full(wp2), _full(bias),
            *[_full(m) for m in mat_args],
        ],
        out_specs=[
            pl.BlockSpec((p, c, npl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 2, c, kh, kwl), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, c, npl), x_flat.dtype),
            jax.ShapeDtypeStruct((d, 2, c, kh, kwl), x_flat.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, z, wp1, wp2, bias, *mat_args)


def main():
    enable_compilation_cache()
    spectral.set_fp32_transform_precision("high")
    rng = np.random.default_rng(0)
    for transform in ("Fourier", "Hartley"):
        spec = make_tower_spec(transform, SIZES, MODES, C)
        d, kh, kwl = spec.sizes[0], spec.kh, spec.kwl
        npl = spec.sizes[2] * spec.hl
        x = jnp.asarray(rng.standard_normal((d, C, npl)).astype(np.float32))
        z = jnp.asarray((rng.standard_normal((d, 2, C, kh, kwl)) * 0.1)
                        .astype(np.float32))
        w_cat = jnp.asarray(rng.standard_normal((2 * C, C)).astype(
            np.float32) * 0.2)
        w_cc_t = jnp.asarray(rng.standard_normal((C, C)).astype(
            np.float32) * 0.2)
        b_cat = jnp.asarray(rng.standard_normal((2 * C,)).astype(
            np.float32) * 0.1)
        wp1 = _pack_weight(w_cat, jnp.float32)
        wp2 = _pack_weight(w_cc_t, jnp.float32)
        bias = b_cat.astype(jnp.float32)[:, None]

        print(f"--- {transform} grid={SIZES} kh={kh} kwl={kwl} "
              f"npl={npl}", flush=True)

        def t(name, p=8, **flags):
            fn = lambda xv: run_variant(  # noqa: E731
                xv, z, wp1, wp2, bias, spec, p, **flags)
            try:
                ms = timed_loop_ms(fn, x, n_short=2, n_long=10, repeats=3)
            except Exception as e:
                msg = str(e).replace("\n", " ")[:140]
                print(f"  {name:34s} FAILED: {type(e).__name__}: {msg}",
                      flush=True)
                return None
            print(f"  {name:34s} {ms:7.3f} ms/block", flush=True)
            return ms

        t("copy (DMA floor)", tail="off", inverse="off", forward="off")
        t("+tail 3dot", tail="3dot", inverse="off", forward="off")
        t("+inverse", tail="3dot", inverse="on", forward="off")
        t("+inverse turnfree", tail="3dot", inverse="turnfree",
          forward="off")
        t("full (3dot tail)", tail="3dot", inverse="on", forward="on")
        t("full turnfree", tail="3dot", inverse="turnfree", forward="on")
        t("full turnfree packed-tail", tail="packed", inverse="turnfree",
          forward="on")
        t("full packed (v2 shape)", tail="packed", inverse="on",
          forward="on")
        for p in (4, 12):
            t(f"full turnfree P={p}", p=p, tail="3dot",
              inverse="turnfree", forward="on")

        # production kernel cross-check + numerics of 3dot/turnfree
        fn_prod = lambda xv: fused_tower_block(  # noqa: E731
            xv, z, w_cat, w_cc_t, b_cat, spec, False)
        ms = timed_loop_ms(fn_prod, x, n_short=2, n_long=10, repeats=3)
        print(f"  {'v2 production':34s} {ms:7.3f} ms/block", flush=True)
        want = fused_tower_block(x, z, w_cat, w_cc_t, b_cat, spec, False)
        for label, flags in (
                ("3dot", dict(tail="3dot", inverse="on", forward="on")),
                ("turnfree", dict(tail="3dot", inverse="turnfree",
                                  forward="on"))):
            try:
                got = run_variant(x, z, wp1, wp2, bias, spec, 8, **flags)
            except Exception as e:
                print(f"  {label}-vs-v2: FAILED {type(e).__name__}",
                      flush=True)
                continue
            for nm, a, b_ in zip(("out", "f"), want, got):
                dmax = float(jnp.max(jnp.abs(a - b_)))
                rel = dmax / float(jnp.max(jnp.abs(a)))
                print(f"  {label}-vs-v2 {nm}: max|d|={dmax:.2e} "
                      f"rel={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
