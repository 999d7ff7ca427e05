"""Fused Pallas kernel for the NeuralOperatorSeg tower block (FNOSeg /
HNOSeg, shared weights).

The reference runs a full FFT -> mix -> inverse FFT *inside every one of
24 blocks* plus a parallel 1x1 conv branch and a concat block skip
(reference ``nets/architectures.py:511-608``,
``nets/hartley_operator.py:109-271``, ``nets/fourier_operator.py:109-211``).
On TPU that structure is memory-bound: every stage re-reads the full-res
volume from HBM, and the 1x1 channel mixes (K=24) waste 5x of every MXU
pass on lane padding.

This kernel restructures one whole block into a single pass over depth
planes of a flat ``(D, C, W*HL)`` volume (H on the lane axis, padded to a
multiple of 128):

  per plane d:
    y1   = inverse 2D stage  (W-expand 'mid' dot, then a TURN-FREE
                              H-expand: one batched dot_general that
                              contracts KH as the sublane dim against a
                              per-(component, channel) replicated matrix
                              stack — no transpose; see _mrep_mat)
                                                             [from z]
    p,q  = one packed dot      [W_conv ; W_cc_x] @ x
    t    = selu(y1 + p)
    out  = selu(W_cc_t @ t + q + b_cc)                       -> HBM
    f    = forward 2D stage of out (H 'first' dot, transpose,
                                    W 'mid' dot)             -> HBM (small)

so each block costs exactly one read + one write of the volume; the
depth-axis transform stages run between kernels in XLA on the small
``(D, 2, C, KH, KW)`` tensors (``d_stage_*`` below), where they are one
well-shaped matmul each.

fp32 precision inside the kernel uses the *packed-K bf16x3* trick: a
K-dim contraction is computed as one MXU pass over
``[hi; hi; lo] x [Mhi; Mlo; Mhi]`` — for K <= 42 the packed K stays
within one 128 tile, so fp32-class accuracy (measured rel. err ~6e-6,
same class as the 'high' serving precision) costs the same as a single
bf16 pass. Mosaic has no Precision.HIGH dots, and HIGHEST costs 6
passes. bfloat16 activations skip the packing and run native MXU.

Layouts/conventions (packed corner spectra, 1/N forward norm) match
``ops/spectral.py`` exactly; the height/width stage matrices are the
same ``_dft_mats_np`` outputs, so values agree with the module path to
fp rounding (the axis contraction order is fixed H -> W -> D instead of
reduction-sorted — mathematically identical, separable transform).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.spectral import _dft_mats_np, _prec
from ._common import hi_lo as _hi_lo, selu as _selu

__all__ = ["TowerSpec", "make_tower_spec", "fused_tower_block",
           "entry_forward_hw", "d_stage_forward", "d_stage_inverse",
           "block_spectrum_update", "to_tower_flat", "from_tower_flat"]


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


class TowerSpec(NamedTuple):
    """Static (hashable) description of one tower-block fusion problem.
    Stage matrices live in the lru-cached ``_spec_mats`` keyed by this."""
    transform: str                  # 'Hartley' | 'Fourier'
    sizes: Tuple[int, int, int]     # (D, H, W) of the tower grid
    modes: Tuple[int, int, int]     # kept modes (already clipped)
    channels: int
    hl: int                         # H padded to a lane multiple
    kd: int                         # spectrum depth size (2*md)
    kh: int                         # 2*mh
    kw: int                         # 2*mw (Hartley) or mw (Fourier rfft)
    kwl: int                        # kw lane-padded to 128 (DMA efficiency:
                                    # 28-float rows move at ~22 GB/s through
                                    # the DMA engines; 128-lane rows at full
                                    # bandwidth. The pad fuses into the XLA
                                    # producers/consumers.)
    n_ds: int                       # deep-supervision rows in w_cat (0=off)


def make_tower_spec(transform: str, sizes, modes, channels,
                    n_ds: int = 0) -> TowerSpec:
    d, h, w = (int(s) for s in sizes)
    md, mh, mw = (int(m) for m in modes)
    kw = 2 * mw if transform == "Hartley" else mw
    # kwl == kw: lane-padding the spectral tensors to 128 was measured a
    # net LOSS (kernel-side DMA gain 0.07 ms/block vs 0.7 ms/block of
    # XLA pad/slice traffic); the machinery stays for future use.
    return TowerSpec(transform, (d, h, w), (md, mh, mw), int(channels),
                     _ceil128(h), 2 * md, 2 * mh, kw, kw, int(n_ds))


@functools.lru_cache(maxsize=32)
def _spec_mats(spec: TowerSpec):
    """float64 stage matrices for a spec.

    Keys (shapes):
      mh_fwd (HL, KH) cos,sin/H   H 'first' (zero rows at lane pads)
      mw_fwd (W, KW)  cos,sin/W   W 'mid'
      mw_inv (KW, W)              W 'mid' inverse
      mh_inv (KH, HL)             H final inverse (zero cols at pads)
      md_fwd (D, KD)              D forward stage (XLA side)
      md_inv (KD, D)              D inverse stage (XLA side)
    """
    d, h, w = spec.sizes
    md, mh, mw = spec.modes

    def pad_rows(m, rows):
        return np.pad(m, ((0, rows - m.shape[0]), (0, 0)))

    def pad_cols(m, cols):
        return np.pad(m, ((0, 0), (0, cols - m.shape[1])))

    if spec.transform == "Hartley":
        ch, sh = _dft_mats_np(h, mh, True, False, -1)     # (H, KH), 1/H
        cw, sw = _dft_mats_np(w, mw, True, False, -1)     # (W, KW)
        cwi, swi = _dft_mats_np(w, mw, False, False, -1)  # (KW, W)
        chi, shi = _dft_mats_np(h, mh, False, False, -1)  # (KH, H)
        cd, sd = _dft_mats_np(d, md, True, False, -1)     # (D, KD)
        cdi, sdi = _dft_mats_np(d, md, False, False, -1)  # (KD, D)
        # H final (inverse) = Hartley 'fold': re*(C-S) + im*(-(C+S))
        mh_inv = (chi - shi, -(chi + shi))
    else:
        ch, sh = _dft_mats_np(h, mh, True, False, -1)
        # last (rfft) axis keeps modes [0..mw-1] only, 1/W norm
        ks = np.arange(mw)
        theta = 2.0 * np.pi * np.outer(np.arange(w), ks) / w
        cw, sw = np.cos(theta) / w, np.sin(-theta) / w    # (W, KW)
        # inverse W: Hermitian doubling weights (1, 2, 2, ...) folded
        # into a complex 'mid' scale by w_k * e^{+i theta}
        wk = np.where(ks == 0, 1.0, 2.0)
        thetai = 2.0 * np.pi * np.outer(ks, np.arange(w)) / w
        cwi = wk[:, None] * np.cos(thetai)                # (KW, W)
        swi = wk[:, None] * np.sin(thetai)
        # inverse H final = Re extraction of e^{+i theta}: re*C - im*S
        ksh = np.concatenate([np.arange(mh), np.arange(h - mh, h)])
        thetah = 2.0 * np.pi * np.outer(ksh, np.arange(h)) / h
        mh_inv = (np.cos(thetah), -np.sin(thetah))        # (KH, H)
        cd, sd = _dft_mats_np(d, md, True, False, -1)
        ksd = np.concatenate([np.arange(md), np.arange(d - md, d)])
        thetad = 2.0 * np.pi * np.outer(ksd, np.arange(d)) / d
        cdi, sdi = np.cos(thetad), np.sin(thetad)         # (KD, D), e^{+i}

    return {
        "mh_fwd": (pad_rows(ch, spec.hl), pad_rows(sh, spec.hl)),
        # W stages padded to kwl: zero N-cols (forward) / zero K-rows
        # (inverse) make the padded spectral lanes exact zeros
        "mw_fwd": (pad_cols(cw, spec.kwl), pad_cols(sw, spec.kwl)),
        "mw_inv": (pad_rows(cwi, spec.kwl), pad_rows(swi, spec.kwl)),
        "mh_inv": (pad_cols(mh_inv[0], spec.hl), pad_cols(mh_inv[1],
                                                          spec.hl)),
        "md_fwd": (cd, sd),
        "md_inv": (cdi, sdi),
    }


# ---------------------------------------------------------------------------
# packed-K bf16x3 helpers
# ---------------------------------------------------------------------------

def _pack_operand(x, axis):
    """fp32 operand -> bf16 [hi; hi; lo] along the contraction axis."""
    hi, lo = _hi_lo(x)
    return jnp.concatenate([hi, hi, lo], axis=axis)


def _pack_matrix_np(m):
    """numpy fp64 matrix -> bf16 [hi; lo; hi] along axis 0 (the K dim)."""
    f32 = np.asarray(m, np.float32)
    hi = f32.astype(jnp.bfloat16)
    lo = (f32 - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.concatenate([np.asarray(hi), np.asarray(lo), np.asarray(hi)],
                          axis=0)


@functools.lru_cache(maxsize=32)
def _kernel_mats(spec: TowerSpec, packed: bool):
    """bf16 device-ready stage matrices in kernel-argument order:
    (mwi_cs, mhi_a, mhi_b, mhf_hi, mhf_lo, mwf_cs).

    The cos/sin pairs of the W stages and the forward H stage ride as
    one N-stacked matrix ([C | S]) so each stage is a single dot; the
    forward H stage keeps hi/lo bf16 halves separately (3-term bf16x3
    accumulation — K=HL stays one 128-tile per term)."""
    m = _spec_mats(spec)
    mwi_cs = np.concatenate(m["mw_inv"], axis=1)      # (KW, 2W)
    mwf_cs = np.concatenate(m["mw_fwd"], axis=1)      # (W, 2KW)
    mhf_cs = np.concatenate(m["mh_fwd"], axis=1)      # (HL, 2KH)
    if packed:
        f32 = np.asarray(mhf_cs, np.float32)
        mhf_hi = f32.astype(jnp.bfloat16)
        mhf_lo = (f32 - np.asarray(mhf_hi, np.float32)).astype(
            jnp.bfloat16)
        return (_pack_matrix_np(mwi_cs),
                _pack_matrix_np(m["mh_inv"][0]),
                _pack_matrix_np(m["mh_inv"][1]),
                np.asarray(mhf_hi), np.asarray(mhf_lo),
                _pack_matrix_np(mwf_cs))
    cast = lambda x: np.asarray(x, np.float32).astype(jnp.bfloat16)  # noqa
    mhf = cast(mhf_cs)
    return (cast(mwi_cs), cast(m["mh_inv"][0]), cast(m["mh_inv"][1]),
            mhf, mhf, cast(mwf_cs))


def _pack_weight(w, dtype):
    """(O, K) channel-mix weight prepared for the kernel dot."""
    if dtype == jnp.float32:
        hi, lo = _hi_lo(w.astype(jnp.float32))
        return jnp.concatenate([hi, lo, hi], axis=1)
    return w.astype(jnp.bfloat16)


@functools.lru_cache(maxsize=32)
def _mrep_mat(spec: TowerSpec, packed: bool):
    """Per-(component, channel) replicated H-expand matrix stack for the
    turn-free inverse: ``[A]*C + [B]*C`` along a leading batch axis
    ((2C, KH, HL); packed [hi; lo; hi] along KH when ``packed``).

    The batched dot_general against this stack contracts KH as the
    SUBLANE dim of the combined (2, C, KH, W) inverse intermediate —
    the corner turn (swapaxes KH<->W) it replaces cost ~0.8/0.46
    ms/block (Fourier/Hartley flagship grid; round-5 attribution,
    tools/proto_tower_v6.py: v2 2.88/2.74 -> turn-free 2.14/2.20).
    VMEM cost: 48 x 84 x 128 bf16 ~ 1.0 MB."""
    m = _spec_mats(spec)
    a, b = m["mh_inv"]
    if packed:
        a, b = _pack_matrix_np(a), _pack_matrix_np(b)
    else:
        a = np.asarray(np.asarray(a, np.float32), jnp.bfloat16)
        b = np.asarray(np.asarray(b, np.float32), jnp.bfloat16)
    c = spec.channels
    return np.concatenate([np.broadcast_to(a, (c,) + a.shape),
                           np.broadcast_to(b, (c,) + b.shape)]).copy()


def _kdot(a, b):
    """MXU dot with fp32 accumulation (operands pre-packed/bf16)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _maybe_pack(x, axis, packed):
    if packed:
        return _pack_operand(x, axis)
    return x.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _tower_kernel(x_ref, z_ref, wp1_ref, wp2_ref, bias_ref,
                  mwi_cs, mhf_hi, mhf_lo, mwf_cs, mrep,
                  *rest, spec: TowerSpec, packed: bool, p_planes: int):
    # rest = [dsp_ref if n_ds] out_ref f_ref [ds_ref if n_ds]
    rest = list(rest)
    dsp_ref = rest.pop(0) if spec.n_ds else None
    out_ref, f_ref = rest.pop(0), rest.pop(0)
    ds_ref = rest.pop(0) if spec.n_ds else None
    c = spec.channels
    _, h, w = spec.sizes
    hl, kh, kwl = spec.hl, spec.kh, spec.kwl
    npl = w * hl

    def _plane(p, carry):  # fori_loop body: ONE copy of the kernel IR
        # ---- inverse 2D: z (2, C, KH, KW) -> y1 (C, NPL).
        # One N-stacked dot against [Cwi | Swi], complex combine, then the
        # TURN-FREE H-expand: one batched dot_general contracting KH as
        # the SUBLANE dim against the [A]*C+[B]*C stack (see _mrep_mat) —
        # no swapaxes relayout anywhere in the inverse.
        z = z_ref[p].reshape(2 * c * kh, kwl)
        ab = _kdot(_maybe_pack(z, 1, packed), mwi_cs[...])  # (2CKH, 2W)
        a = ab[:, :w].reshape(2, c, kh, w)
        b = ab[:, w:].reshape(2, c, kh, w)
        y = jnp.stack([a[0] - b[1], b[0] + a[1]])          # (2, C, KH, W)
        y2 = _maybe_pack(y.reshape(2 * c, kh, w), 1, packed)
        yy = jax.lax.dot_general(
            y2, mrep[...], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (2C, W, HL)
        y1 = (yy[:c] + yy[c:]).reshape(c, npl)

        # ---- tail: p/q one packed dot on x; out = selu(...)
        x = x_ref[p]                                 # (C, NPL)
        xp = _maybe_pack(x, 0, packed)
        pq = _kdot(wp1_ref[...], xp)                 # (2C [+n_ds], NPL)
        if spec.n_ds:
            # deep-supervision projection of THIS block's input rides
            # the same packed dot (rows beyond 2C); bias-free (conv_ds
            # bias applies once on the accumulated sum). The running
            # accumulator is FOLDED in here: ds_out = ds_prev + contrib
            # — the XLA carry-add pass over the ds volume disappears.
            ds_ref[p] = (dsp_ref[p].astype(jnp.float32)
                         + pq[2 * c:]).astype(ds_ref.dtype)
            pq = pq[:2 * c]
        pq = pq + bias_ref[...]
        t = _selu(y1 + pq[:c])
        tp = _maybe_pack(t, 0, packed)
        o = _selu(_kdot(wp2_ref[...], tp) + pq[c:])
        out_ref[p] = o.astype(out_ref.dtype)

        # ---- forward 2D of out: (C, NPL) -> f (2, C, KH, KW).
        # H 'first' as 3-term bf16x3 accumulation (K=HL stays one tile
        # per term; no 3x lane-concat), W 'mid' as one N-stacked dot.
        o2 = o.reshape(c, w, hl).reshape(c * w, hl)
        if packed:
            ohi, olo = _hi_lo(o2)
            fcs = (_kdot(ohi, mhf_hi[...]) + _kdot(ohi, mhf_lo[...])
                   + _kdot(olo, mhf_hi[...]))        # (CW, 2KH)
        else:
            fcs = _kdot(o2.astype(jnp.bfloat16), mhf_hi[...])
        fcs = fcs.reshape(c, w, 2 * kh)
        fcs = jnp.swapaxes(fcs, 1, 2).reshape(c * 2 * kh, w)
        gg = _kdot(_maybe_pack(fcs, 1, packed), mwf_cs[...])  # (C2KH, 2KW)
        ga = gg[:, :kwl].reshape(c, 2, kh, kwl)
        gb = gg[:, kwl:].reshape(c, 2, kh, kwl)
        gre = ga[:, 0] - gb[:, 1]
        gim = gb[:, 0] + ga[:, 1]
        f_ref[p, 0] = gre.astype(f_ref.dtype)
        f_ref[p, 1] = gim.astype(f_ref.dtype)
        return carry

    if p_planes == 1:
        _plane(0, 0)
    else:
        jax.lax.fori_loop(0, p_planes, _plane, 0)


def _pick_p(d: int) -> int:
    """Planes per grid step: amortize per-step pipeline overhead while
    keeping VMEM comfortable. Partial last blocks are handled by Pallas
    (reads padded, out-of-range writes masked; planes are independent).
    ``M3SEG_TOWER_P`` overrides (perf sweeps; read at trace time)."""
    override = os.environ.get("M3SEG_TOWER_P")
    if override:
        return max(1, min(int(override), d))
    if d >= 32:
        return 8
    if d >= 8:
        return 4
    return 1


def _run_tower_kernel(x_flat, z, wp1, wp2, bias, spec: TowerSpec,
                      interpret: bool, ds_prev=None):
    d = spec.sizes[0]
    c, kh, kwl = spec.channels, spec.kh, spec.kwl
    npl = x_flat.shape[-1]
    dtype = x_flat.dtype
    packed = dtype == jnp.float32
    p = _pick_p(d)
    assert (ds_prev is not None) == bool(spec.n_ds)

    km = _kernel_mats(spec, packed)  # numpy: no device consts
    # (mwi_cs, mhf_hi, mhf_lo, mwf_cs, mrep) — the separate mhi_a/mhi_b
    # H-expand mats are replaced by the batched turn-free stack
    mat_args = [km[0], km[3], km[4], km[5], _mrep_mat(spec, packed)]
    kernel = functools.partial(_tower_kernel, spec=spec, packed=packed,
                               p_planes=p)

    def _full(m):
        return pl.BlockSpec(m.shape,
                            lambda i, nd=m.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(d, p),),
        in_specs=[
            pl.BlockSpec((p, c, npl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 2, c, kh, kwl), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full(wp1), _full(wp2), _full(bias),
            *[_full(m) for m in mat_args],
        ] + ([pl.BlockSpec((p, spec.n_ds, npl), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] if spec.n_ds else []),
        out_specs=[
            pl.BlockSpec((p, c, npl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 2, c, kh, kwl), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((p, spec.n_ds, npl), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] if spec.n_ds else []),
        out_shape=[
            jax.ShapeDtypeStruct((d, c, npl), dtype),
            # f rides the VOLUME dtype to halve its HBM round trip per
            # block. NOT numerically free in bf16 mode: the partials are
            # fp32 MXU accumulations, so the bf16 store adds one rounding
            # (~4e-3 rel) per plane term before the O(D) depth
            # contraction (whose compute stays fp32, d_stage_forward).
            # End-to-end effect is bounded by the bf16 tower parity
            # tests; accepted as a bandwidth tradeoff. ds stays fp32
            # (accumulated over all blocks).
            jax.ShapeDtypeStruct((d, 2, c, kh, kwl), dtype),
        ] + ([jax.ShapeDtypeStruct((d, spec.n_ds, npl), jnp.float32)]
             if spec.n_ds else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, z, wp1, wp2, bias, *mat_args,
      *(() if ds_prev is None else (ds_prev,)))
    return tuple(outs)


# ---------------------------------------------------------------------------
# XLA-side depth stages and spectrum update (small tensors)
# ---------------------------------------------------------------------------

def d_stage_forward(f, spec: TowerSpec):
    """(D, 2, C, KH, KW) per-plane partial spectra -> packed spectrum.

    Hartley: real 'fold' output (KD, C, KH, KW).
    Fourier: complex 'mid' output (2, KD, C, KH, KW).

    Compute is pinned to fp32 regardless of f's storage dtype: the
    spectrum tensors are tiny, the D-axis contraction sums O(D) terms,
    and in bf16 mode f arrives bf16 (halving its HBM round trip) — the
    up-cast fuses into the einsum reads.
    """
    dt = jnp.float32
    f = f.astype(dt)
    prec = _prec(dt)
    mats = _spec_mats(spec)
    if f.shape[-1] == spec.kwl and spec.kwl != spec.kw:
        f = f[..., :spec.kw]   # fuses into the einsum reads below
    cd = np.asarray(mats["md_fwd"][0], dt)
    sd = np.asarray(mats["md_fwd"][1], dt)
    if spec.transform == "Hartley":
        # fold: sum_d re*(C-S) - im*(C+S)
        m = np.stack([cd - sd, -(cd + sd)], axis=1)     # (D, 2, KD)
        return jnp.einsum("dqcxy,dqk->kcxy", f, m, precision=prec)
    re = jnp.einsum("dcxy,dk->kcxy", f[:, 0], cd, precision=prec) \
        - jnp.einsum("dcxy,dk->kcxy", f[:, 1], sd, precision=prec)
    im = jnp.einsum("dcxy,dk->kcxy", f[:, 0], sd, precision=prec) \
        + jnp.einsum("dcxy,dk->kcxy", f[:, 1], cd, precision=prec)
    return jnp.stack([re, im])


def d_stage_inverse(s, spec: TowerSpec):
    """Packed spectrum -> per-plane complex pre-images (D, 2, C, KH, KW).
    fp32 compute (see d_stage_forward); the caller casts z to the volume
    dtype, which fuses into these einsums' consumers."""
    dt = jnp.float32
    s = s.astype(dt)
    prec = _prec(dt)
    mats = _spec_mats(spec)
    cdi = np.asarray(mats["md_inv"][0], dt)
    sdi = np.asarray(mats["md_inv"][1], dt)
    pad = [(0, 0)] * 4 + [(0, spec.kwl - spec.kw)]
    if spec.transform == "Hartley":
        # 'first': real -> complex, e^{-i theta}
        m = np.stack([cdi, sdi], axis=-1)               # (KD, D, 2)
        z = jnp.einsum("kcxy,kdq->dqcxy", s, m, precision=prec)
        return jnp.pad(z, pad)   # kernel-facing lane pad (fused write)
    re, im = s[0], s[1]
    zre = jnp.einsum("kcxy,kd->dcxy", re, cdi, precision=prec) \
        - jnp.einsum("kcxy,kd->dcxy", im, sdi, precision=prec)
    zim = jnp.einsum("kcxy,kd->dcxy", re, sdi, precision=prec) \
        + jnp.einsum("kcxy,kd->dcxy", im, cdi, precision=prec)
    return jnp.pad(jnp.stack([zre, zim], axis=1), pad)


def block_spectrum_update(f, op_params, spec: TowerSpec):
    """Between-kernel update: D forward stage, channel mix (+ freq SELU
    for Hartley, reference ``nets/hartley_operator.py:265-267``), D
    inverse stage. ``op_params``: (weight,) for Hartley, (weight_real,
    weight_imag) for Fourier — reference (O, I) layout. fp32 compute
    throughout (see d_stage_forward); in bf16 mode ``f`` arrives
    bf16-rounded from the kernel store (one extra rounding vs an fp32
    carry — see the out_shape note in fused_tower_block)."""
    dt = jnp.float32
    prec = _prec(dt)
    s = d_stage_forward(f, spec)
    if spec.transform == "Hartley":
        w = op_params[0].astype(dt)
        y = jnp.einsum("kcxy,oc->koxy", s, w, precision=prec)
        y = jax.nn.selu(y)
    else:
        wr = op_params[0].astype(dt)
        wi = op_params[1].astype(dt)
        yre = jnp.einsum("kcxy,oc->koxy", s[0], wr, precision=prec) \
            - jnp.einsum("kcxy,oc->koxy", s[1], wi, precision=prec)
        yim = jnp.einsum("kcxy,oc->koxy", s[0], wi, precision=prec) \
            + jnp.einsum("kcxy,oc->koxy", s[1], wr, precision=prec)
        y = jnp.stack([yre, yim])
    return d_stage_inverse(y, spec)


def entry_forward_hw(x_flat, spec: TowerSpec):
    """XLA forward H/W stages of the whole flat volume (the tower entry):
    (D, C, W*HL) -> per-plane partials (D, 2, C, KH, KW)."""
    d, h, w = spec.sizes
    c = spec.channels
    dt = x_flat.dtype
    prec = _prec(dt)
    mats = _spec_mats(spec)
    x4 = x_flat.reshape(d, c, w, spec.hl)
    ch = np.asarray(mats["mh_fwd"][0], dt)
    sh = np.asarray(mats["mh_fwd"][1], dt)
    fre = jnp.einsum("dcwh,hk->dcwk", x4, ch, precision=prec)
    fim = jnp.einsum("dcwh,hk->dcwk", x4, sh, precision=prec)
    cw = np.asarray(mats["mw_fwd"][0], dt)
    sw = np.asarray(mats["mw_fwd"][1], dt)
    gre = jnp.einsum("dcwk,wj->dckj", fre, cw, precision=prec) \
        - jnp.einsum("dcwk,wj->dckj", fim, sw, precision=prec)
    gim = jnp.einsum("dcwk,wj->dckj", fre, sw, precision=prec) \
        + jnp.einsum("dcwk,wj->dckj", fim, cw, precision=prec)
    return jnp.stack([gre, gim], axis=1)


# ---------------------------------------------------------------------------
# reference (plain-jnp) block body — backward pass + numerics oracle
# ---------------------------------------------------------------------------

def _block_reference(x_flat, z, w_cat, w_cc_t, b_cat, spec: TowerSpec,
                     ds_prev=None):
    """Pure-jnp replay of the kernel body over all planes at once.

    ``w_cat``: (2C, C) rows = [W_conv ; W_cc_x]; ``w_cc_t``: (C, C);
    both contract the input-channel (column) dimension. ``ds_prev``:
    running deep-supervision accumulator folded into the ds output.
    """
    d, h, w = spec.sizes
    c, hl = spec.channels, spec.hl
    dt = x_flat.dtype
    prec = _prec(dt)
    mats = _spec_mats(spec)

    cwi = np.asarray(mats["mw_inv"][0], dt)
    swi = np.asarray(mats["mw_inv"][1], dt)
    # compute in the volume dtype like the kernel does (the model feeds
    # z in fp32; without this cast a bf16 replay would promote to fp32
    # mid-chain and emit the wrong output dtypes for the VJP)
    z = z.astype(dt)
    zre, zim = z[:, 0], z[:, 1]                   # (D, C, KH, KW)
    yre = jnp.einsum("dcxj,jw->dcxw", zre, cwi, precision=prec) \
        - jnp.einsum("dcxj,jw->dcxw", zim, swi, precision=prec)
    yim = jnp.einsum("dcxj,jw->dcxw", zre, swi, precision=prec) \
        + jnp.einsum("dcxj,jw->dcxw", zim, cwi, precision=prec)
    mha = np.asarray(mats["mh_inv"][0], dt)
    mhb = np.asarray(mats["mh_inv"][1], dt)
    y1 = jnp.einsum("dcxw,xh->dcwh", yre, mha, precision=prec) \
        + jnp.einsum("dcxw,xh->dcwh", yim, mhb, precision=prec)
    y1 = y1.reshape(d, c, w * hl)

    pq = jnp.einsum("dcn,oc->don", x_flat, w_cat.astype(dt),
                    precision=prec)
    ds = None
    if spec.n_ds:
        ds = pq[:, 2 * c:]
        pq = pq[:, :2 * c]
    pq = pq + b_cat.astype(dt)[None, :, None]
    t = jax.nn.selu(y1 + pq[:, :c])
    o = jax.nn.selu(
        jnp.einsum("dcn,oc->don", t, w_cc_t.astype(dt), precision=prec)
        + pq[:, c:])

    # match the kernel's output-dtype contract exactly (out and f in the
    # input dtype; ds in fp32) so _fused_bwd's jax.vjp accepts the
    # cotangents for bf16 inputs too
    f = entry_forward_hw(o, spec).astype(dt)
    if spec.n_ds:
        ds = ds.astype(jnp.float32)
        if ds_prev is not None:
            ds = ds_prev.astype(jnp.float32) + ds
        return o, f, ds
    return o, f


# ---------------------------------------------------------------------------
# public op with custom VJP (backward = jnp reference replay)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_tower_block(x_flat, z, w_cat, w_cc_t, b_cat, spec, interpret,
                      ds_prev=None):
    """One fused tower block: (x_flat, z) -> (out_flat, f_next).

    Args:
        x_flat: (D, C, W*HL) block input volume.
        z: (D, 2, C, KH, KW) inverse-D-stage pre-images
            (``d_stage_inverse`` of the mixed spectrum).
        w_cat: (2C + n_ds, C) stacked [conv_branch ; conv_concat-x ;
            deep-supervision rows for THIS block's input] matrices.
        w_cc_t: (C, C) conv_concat matrix for the activated branch.
        b_cat: (2C,) stacked [conv_branch bias or zeros ; conv_concat bias].
        spec: TowerSpec (static).
        interpret: run the Pallas interpreter (CPU tests).
        ds_prev: (D, n_ds, W*HL) fp32 running deep-supervision
            accumulator (required iff ``spec.n_ds``) — folded into the
            kernel's ds output, so the per-block XLA carry-add pass
            over the ds volume disappears.

    Returns:
        out_flat (D, C, W*HL), f_next (D, 2, C, KH, KW) — the forward
        H/W partial spectra of out (feed ``block_spectrum_update``) —
        and, when ``spec.n_ds``, ds (D, n_ds, W*HL): ``ds_prev`` plus
        the bias-free deep-supervision projection of x_flat (rides the
        packed dot).
    """
    return _fused_forward(x_flat, z, w_cat, w_cc_t, b_cat, spec, interpret,
                          ds_prev)


def _fused_forward(x_flat, z, w_cat, w_cc_t, b_cat, spec, interpret,
                   ds_prev=None):
    dtype = x_flat.dtype
    wp1 = _pack_weight(w_cat, dtype)
    wp2 = _pack_weight(w_cc_t, dtype)
    bias = b_cat.astype(jnp.float32)[:, None]
    return _run_tower_kernel(x_flat, z.astype(dtype), wp1, wp2, bias,
                             spec, interpret, ds_prev=ds_prev)


def _fused_fwd(x_flat, z, w_cat, w_cc_t, b_cat, spec, interpret, ds_prev):
    out = _fused_forward(x_flat, z, w_cat, w_cc_t, b_cat, spec, interpret,
                         ds_prev)
    return out, (x_flat, z, w_cat, w_cc_t, b_cat)


def _fused_bwd(spec, interpret, res, g):
    x_flat, z, w_cat, w_cc_t, b_cat = res
    # ds_prev enters the outputs only as an additive identity; its value
    # never multiplies anything, so the replay is differentiated at
    # ds_prev = 0 (built from the ds cotangent's shape) — the returned
    # cotangents are exact for any ds_prev.
    if spec.n_ds:
        zero_ds = jax.tree_util.tree_map(jnp.zeros_like, g[2])
        _, vjp = jax.vjp(
            lambda *a: _block_reference(*a[:5], spec=spec, ds_prev=a[5]),
            x_flat, z, w_cat, w_cc_t, b_cat, zero_ds)
        return vjp(g)
    _, vjp = jax.vjp(
        lambda *a: _block_reference(*a, spec=spec), x_flat, z, w_cat,
        w_cc_t, b_cat)
    return vjp(g) + (None,)


fused_tower_block.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# layout conversion helpers
# ---------------------------------------------------------------------------

def to_tower_flat(x_cl: jax.Array) -> jax.Array:
    """(1, D, H, W, C) channels-last -> (D, C, W*HL) flat (H on lanes)."""
    _, d, h, w, c = x_cl.shape
    hl = _ceil128(h)
    xt = jnp.transpose(x_cl[0], (0, 3, 2, 1))     # (D, C, W, H)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, hl - h)))
    return xt.reshape(d, c, w * hl)


def from_tower_flat(x_flat: jax.Array, sizes, channels) -> jax.Array:
    """(D, C, W*HL) -> (1, C, D, H, W) channel-first."""
    d, h, w = sizes
    hl = _ceil128(h)
    x4 = x_flat.reshape(d, channels, w, hl)[..., :h]   # (D, C, W, H)
    return jnp.transpose(x4, (1, 0, 3, 2))[None]       # (1, C, D, H, W)
