"""Fused tower block, v5: the depth-axis transform stages run INSIDE the
kernel against a VMEM-resident packed spectrum — the per-block ``f``/``z``
HBM tensors of ``tower_block.py`` disappear.

The v2 kernel (``tower_block.fused_tower_block``) exchanges per-plane
partial spectra with XLA between kernels: each block writes ``f``
(D, 2, C, KH, KW) to HBM, XLA contracts the depth axis, mixes channels,
expands depth again, and writes ``z`` back for the next kernel — ~4 extra
volume-scale-fraction HBM round trips per block plus several XLA
dispatches. Here the whole spectrum lives in one small VMEM block
(~7 MB lane-padded) and the depth stages are two small MXU dots per grid
step:

  per grid step i (P planes):
    z[2P, CKH, KWL]  = Mi_rows(i) @ s_y          (inverse depth stage)
    ... per plane: inverse H/W, 1x1 tail, forward H/W (same as v2) ...
    s_f             += Mf_rows(i)^T @ f_planes   (forward depth stage)

so each block costs exactly one read + one write of the volume and one
tiny (KS, C*KH, 128) spectrum round trip. Between blocks XLA only mixes
channels on the resident-spectrum layout (``spectrum_mix_s``).

Design rules (Mosaic probes: ``tools/proto_mosaic_probe4.py``):
  * 3-D-rhs ``dot_general`` for both depth stages;
  * the spectrum rides LANE-PADDED (kwl = 128) end to end — the pad
    columns are exact zeros (zero N-cols in the forward W matrix) and
    never leave VMEM/registers except in the tiny s tensors, so the XLA
    pad/slice traffic that made kwl=128 a loss for v2 does not exist;
  * depth matrices are zero-padded past D so partial last grid steps
    contribute exact zeros to s_f (planes are NOT independent here);
  * per-plane f staging goes through VMEM scratch rows (values cannot be
    dynamically sliced in fori_loop on this Mosaic).

Precision matches v2 class-for-class: fp32 volumes use packed-K bf16x3
dots, bf16 volumes native MXU with fp32 accumulation; the s carry stays
fp32 (it is the depth-axis accumulator).

Routing is decided by measurement (docs/ROADMAP.md): ``set_enabled`` /
``M3SEG_TOWER_S=1`` switches ``NeuralOperatorSeg``'s fused path here for
the A/B. Reference semantics: ``nets/architectures.py:511-608``,
``nets/hartley_operator.py:109-271``, ``nets/fourier_operator.py:109-211``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.spectral import _prec
from ._common import hi_lo as _hi_lo, selu as _selu
from .tower_block import (TowerSpec, _block_reference, _ceil128,
                          _kernel_mats, _kdot, _maybe_pack, _pack_operand,
                          _pack_weight, _pick_p, _spec_mats,
                          d_stage_forward, entry_forward_hw)

__all__ = ["make_tower_spec_s", "fused_tower_block_s", "spectrum_mix_s",
           "entry_spectrum_s", "set_enabled", "is_enabled"]

_ENABLED = None  # tri-state: None -> consult env var


def set_enabled(on) -> None:
    """Force the v5 routing on/off (None -> env var M3SEG_TOWER_S)."""
    global _ENABLED
    _ENABLED = on


def is_enabled() -> bool:
    if _ENABLED is not None:
        return bool(_ENABLED)
    return os.environ.get("M3SEG_TOWER_S", "0") not in ("0", "", "false")


_HW_PROBE_OK = None  # cached per process: None -> not yet probed
_HW_PROBE_WHY = ""  # cause of a False verdict: miscompute vs probe crash


def _hw_probe_ok() -> bool:
    """Refuse to run the v5 kernel on real Mosaic unless its riskiest
    pattern computes correctly there.

    The v5 forward depth stage writes per-plane rows into a VMEM scratch
    inside ``fori_loop`` and then feeds the whole scratch to one dot.
    On this jax/Mosaic stack that exact pattern COMPILES but returns
    WRONG values (``tools/proto_mosaic_probe4.py`` probe 4: maxdiff
    0.118) — and interpret-mode tests cannot catch it (docs/ROADMAP.md).
    This guard runs the minimal failing pattern once per process on the
    real backend; only a numerically correct result unlocks the route,
    so no env var can produce silently wrong segmentations.
    """
    global _HW_PROBE_OK, _HW_PROBE_WHY
    if _HW_PROBE_OK is not None:
        return _HW_PROBE_OK

    p2, a, b, k = 8, 8, 128, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((p2, a, b)).astype(np.float32)
    m = rng.standard_normal((k, p2)).astype(np.float32)

    def kern(m_ref, x_ref, o_ref, scr):
        def body(p, carry):
            scr[pl.ds(p, 1)] = x_ref[pl.ds(p, 1)] * 2.0
            return carry
        jax.lax.fori_loop(0, p2, body, 0)
        o_ref[...] = jax.lax.dot_general(
            m_ref[...], scr[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((k, a, b), jnp.float32),
            scratch_shapes=[pltpu.VMEM((p2, a, b), jnp.float32)])
        got = np.asarray(jax.jit(f)(m, x))
        want = np.einsum("kd,dab->kab", m, 2.0 * x)
        _HW_PROBE_OK = bool(np.allclose(got, want, atol=1e-3, rtol=1e-3))
        if not _HW_PROBE_OK:
            _HW_PROBE_WHY = (
                "the probe COMPUTES WRONG VALUES on this backend "
                f"(maxdiff {float(np.max(np.abs(got - want))):.3g}; known "
                "Mosaic miscompile, tools/proto_mosaic_probe4.py)")
    except Exception as e:  # compile/dispatch failure, not a miscompute
        _HW_PROBE_OK = False
        _HW_PROBE_WHY = (
            "the probe could not run on this backend "
            f"({type(e).__name__}: {str(e).splitlines()[0][:120]}) — "
            "possibly transient; restart the process to re-probe")
    return _HW_PROBE_OK


def make_tower_spec_s(transform: str, sizes, modes, channels,
                      n_ds: int = 0) -> TowerSpec:
    """v5 spec: identical to ``make_tower_spec`` but with the spectral
    W axis lane-padded to 128 (the resident spectrum and all in-kernel
    spectral tensors use full lanes; the pad never hits HBM volumes)."""
    d, h, w = (int(s) for s in sizes)
    md, mh, mw = (int(m) for m in modes)
    kw = 2 * mw if transform == "Hartley" else mw
    return TowerSpec(transform, (d, h, w), (md, mh, mw), int(channels),
                     _ceil128(h), 2 * md, 2 * mh, kw, _ceil128(kw),
                     int(n_ds))


def _ks(spec: TowerSpec) -> int:
    """Rows of the resident spectrum: KD (Hartley, real) or 2*KD
    (Fourier, re/im stacked)."""
    return spec.kd if spec.transform == "Hartley" else 2 * spec.kd


@functools.lru_cache(maxsize=32)
def _d_mats(spec: TowerSpec, p: int):
    """Depth-stage matrices in kernel layout, float32 numpy, zero-padded
    to ``dg = ceil(D/p)*p`` planes (partial grid steps contribute exact
    zeros to s_f and harmless zeros to z of masked-out planes):

      mi (dg, 2, KS):       z[d, q] = sum_s mi[d, q, s] * s_y[s]
      mf (dg/p, KS, 2P):    s_f[s] += mf[i, s] @ f_scr  per grid step i

    ``mf`` is pre-merged to the kernel's per-step (KS, 2P) layout on the
    host (columns plane-major, re/im minor — f_scr row order): merging
    (P, 2) -> 2P inside the kernel is a MINOR-dim reshape, which this
    Mosaic cannot shape-cast (hardware-verified failure: ab_tower_s,
    ``vector<40x8x2xf32> -> vector<40x16xf32>``).
    """
    d = spec.sizes[0]
    kd = int(spec.kd)
    ks = _ks(spec)
    dg = -(-d // p) * p
    m = _spec_mats(spec)
    cd, sd = (np.asarray(a, np.float64) for a in m["md_fwd"])    # (D, KD)
    cdi, sdi = (np.asarray(a, np.float64) for a in m["md_inv"])  # (KD, D)

    mi = np.zeros((dg, 2, ks), np.float64)
    mf = np.zeros((ks, dg, 2), np.float64)
    if spec.transform == "Hartley":
        # inverse 'first': z = s * e^{-i theta} -> (re, im) = s*(cdi, sdi)
        mi[:d, 0, :] = cdi.T
        mi[:d, 1, :] = sdi.T
        # forward 'fold': s = sum_d re*(C-S) - im*(C+S)
        mf[:, :d, 0] = (cd - sd).T
        mf[:, :d, 1] = -(cd + sd).T
    else:
        # rows [0:kd) = s_re, [kd:2kd) = s_im
        mi[:d, 0, :kd] = cdi.T          # z_re =  s_re*cdi - s_im*sdi
        mi[:d, 0, kd:] = -sdi.T
        mi[:d, 1, :kd] = sdi.T          # z_im =  s_re*sdi + s_im*cdi
        mi[:d, 1, kd:] = cdi.T
        mf[:kd, :d, 0] = cd.T           # s_re =  f_re*cd - f_im*sd
        mf[:kd, :d, 1] = -sd.T
        mf[kd:, :d, 0] = sd.T           # s_im =  f_re*sd + f_im*cd
        mf[kd:, :d, 1] = cd.T
    # (KS, dg, 2) -> per-grid-step (dg/p, KS, 2P): columns plane-major,
    # re/im minor, matching f_scr's row order [p0_re, p0_im, p1_re, ...]
    mf = np.transpose(mf.reshape(ks, dg // p, 2 * p), (1, 0, 2))
    return np.asarray(mi, np.float32), np.ascontiguousarray(mf, np.float32)


def _pack_value_matrix(m, axis):
    """Runtime [Mhi; Mlo; Mhi] bf16 packing along ``axis`` (the matrix
    side of a packed-K dot whose operand side is [hi; hi; lo])."""
    hi, lo = _hi_lo(m)
    return jnp.concatenate([hi, lo, hi], axis=axis)


_dot3 = _kdot  # same MXU dot; dot_general handles the 3-D rhs directly


def _tower_kernel_s(x_ref, sy_ref, mi_ref, mft_ref, wp1_ref, wp2_ref,
                    bias_ref, mwi_cs, mhi_a, mhi_b, mhf_hi, mhf_lo, mwf_cs,
                    *rest, spec: TowerSpec, packed: bool, p_planes: int):
    # rest = [dsp_ref if n_ds] out_ref sf_ref [ds_ref if n_ds] z_scr f_scr
    rest = list(rest)
    dsp_ref = rest.pop(0) if spec.n_ds else None
    out_ref, sf_ref = rest.pop(0), rest.pop(0)
    ds_ref = rest.pop(0) if spec.n_ds else None
    z_scr, f_scr = rest
    i = pl.program_id(0)
    c = spec.channels
    _, h, w = spec.sizes
    hl, kh, kwl = spec.hl, spec.kh, spec.kwl
    npl = w * hl
    ckh = c * kh
    p2 = 2 * p_planes

    # ---- inverse depth stage for this step's planes: one 3-D-rhs dot
    # against the VMEM-resident spectrum
    mi = mi_ref[...].reshape(p2, mi_ref.shape[-1])     # leading merge
    if packed:
        z3 = _dot3(_pack_value_matrix(mi, 1), _pack_operand(sy_ref[...], 0))
    else:
        z3 = _dot3(mi.astype(jnp.bfloat16),
                   sy_ref[...].astype(jnp.bfloat16))
    z_scr[...] = z3                                    # (2P, CKH, KWL) f32

    def _plane(p, carry):  # fori_loop body: ONE copy of the kernel IR
        # ---- inverse 2D: z (2*C*KH, KWL) -> y1 (C*W, HL)
        z = z_scr[pl.ds(2 * p, 2)].reshape(2 * ckh, kwl)
        ab = _kdot(_maybe_pack(z, 1, packed), mwi_cs[...])  # (2CKH, 2W)
        a = ab[:, :w].reshape(2, c, kh, w)
        b = ab[:, w:].reshape(2, c, kh, w)
        y = jnp.stack([a[0] - b[1], b[0] + a[1]])          # (2, C, KH, W)
        y = jnp.swapaxes(y, 2, 3).reshape(2, c * w, kh)
        y1 = (_kdot(_maybe_pack(y[0], 1, packed), mhi_a[...])
              + _kdot(_maybe_pack(y[1], 1, packed), mhi_b[...]))

        # ---- tail: p/q one packed dot on x; out = selu(...)
        x = x_ref[p]                                 # (C, NPL)
        xp = _maybe_pack(x, 0, packed)
        pq = _kdot(wp1_ref[...], xp)                 # (2C [+n_ds], NPL)
        if spec.n_ds:
            # running accumulator folded in (see tower_block.py)
            ds_ref[p] = (dsp_ref[p].astype(jnp.float32)
                         + pq[2 * c:]).astype(ds_ref.dtype)
            pq = pq[:2 * c]
        pq = pq + bias_ref[...]
        t = _selu(y1.reshape(c, npl) + pq[:c])
        tp = _maybe_pack(t, 0, packed)
        o = _selu(_kdot(wp2_ref[...], tp) + pq[c:])
        out_ref[p] = o.astype(out_ref.dtype)

        # ---- forward 2D of out -> staged f rows (fp32 VMEM scratch)
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
        # partial last grid step: out-of-range planes hold memory
        # garbage; their f rows enter the s_f dot against ZERO matrix
        # rows, but 0 * inf/NaN = NaN — SELECT (not multiply) them away
        valid = (i * p_planes + p) < spec.sizes[0]
        f_scr[pl.ds(2 * p, 1)] = jnp.where(
            valid, gre.reshape(1, ckh, kwl), 0.0)
        f_scr[pl.ds(2 * p + 1, 1)] = jnp.where(
            valid, gim.reshape(1, ckh, kwl), 0.0)
        return carry

    if p_planes == 1:
        _plane(0, 0)
    else:
        jax.lax.fori_loop(0, p_planes, _plane, 0)

    # ---- forward depth stage: accumulate this step's planes into the
    # resident output spectrum (constant index map; RMW across steps).
    # mft arrives pre-merged as (1, KS, 2P) — see _d_mats
    mft = mft_ref[0]
    if packed:
        contrib = _dot3(_pack_value_matrix(mft, 1),
                        _pack_operand(f_scr[...], 0))
    else:
        contrib = _dot3(mft.astype(jnp.bfloat16),
                        f_scr[...].astype(jnp.bfloat16))
    sf_ref[...] = jnp.where(i == 0, contrib, sf_ref[...] + contrib)


def _run_tower_kernel_s(x_flat, sy3, wp1, wp2, bias, spec: TowerSpec,
                        interpret: bool, ds_prev=None):
    d = spec.sizes[0]
    c, kh, kwl = spec.channels, spec.kh, spec.kwl
    ckh = c * kh
    ks = _ks(spec)
    npl = x_flat.shape[-1]
    dtype = x_flat.dtype
    packed = dtype == jnp.float32
    p = _pick_p(d)
    mi, mf = _d_mats(spec, p)
    assert (ds_prev is not None) == bool(spec.n_ds)

    mat_args = list(_kernel_mats(spec, packed))  # numpy: no device consts
    kernel = functools.partial(_tower_kernel_s, spec=spec, packed=packed,
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
            pl.BlockSpec((ks, ckh, kwl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 2, ks), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ks, 2 * p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _full(wp1), _full(wp2), _full(bias),
            *[_full(m) for m in mat_args],
        ] + ([pl.BlockSpec((p, spec.n_ds, npl), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] if spec.n_ds else []),
        out_specs=[
            pl.BlockSpec((p, c, npl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, ckh, kwl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((p, spec.n_ds, npl), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] if spec.n_ds else []),
        out_shape=[
            jax.ShapeDtypeStruct((d, c, npl), dtype),
            jax.ShapeDtypeStruct((ks, ckh, kwl), jnp.float32),
        ] + ([jax.ShapeDtypeStruct((d, spec.n_ds, npl), jnp.float32)]
             if spec.n_ds else []),
        scratch_shapes=[pltpu.VMEM((2 * p, ckh, kwl), jnp.float32),
                        pltpu.VMEM((2 * p, ckh, kwl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, sy3, mi, mf, wp1, wp2, bias, *mat_args,
      *(() if ds_prev is None else (ds_prev,)))
    return tuple(outs)


# ---------------------------------------------------------------------------
# XLA-side spectrum ops (resident layout)
# ---------------------------------------------------------------------------

def spectrum_mix_s(sf3, op_params, spec: TowerSpec):
    """Between-kernel channel mix on the resident spectrum layout
    (KS, C*KH, KWL) fp32 -> (KS, C*KH, KWL) fp32; Hartley applies the
    frequency-domain SELU (reference ``nets/hartley_operator.py:265-267``).
    fp32 compute throughout (tiny tensors; depth-stage class parity with
    ``tower_block.block_spectrum_update``)."""
    kd, c, kh, kwl = spec.kd, spec.channels, spec.kh, spec.kwl
    dt = jnp.float32
    prec = _prec(dt)
    sf3 = sf3.astype(dt)
    if spec.transform == "Hartley":
        s = sf3.reshape(kd, c, kh, kwl)
        w = op_params[0].astype(dt)
        y = jax.nn.selu(jnp.einsum("kcxy,oc->koxy", s, w, precision=prec))
        return y.reshape(kd, c * kh, kwl)
    s = sf3.reshape(2, kd, c, kh, kwl)
    wr = op_params[0].astype(dt)
    wi = op_params[1].astype(dt)
    yre = jnp.einsum("kcxy,oc->koxy", s[0], wr, precision=prec) \
        - jnp.einsum("kcxy,oc->koxy", s[1], wi, precision=prec)
    yim = jnp.einsum("kcxy,oc->koxy", s[0], wi, precision=prec) \
        + jnp.einsum("kcxy,oc->koxy", s[1], wr, precision=prec)
    return jnp.stack([yre, yim]).reshape(2 * kd, c * kh, kwl)


def entry_spectrum_s(x_flat, spec: TowerSpec):
    """Tower entry: forward H/W stages + forward depth stage straight to
    the resident spectrum layout (KS, C*KH, KWL) fp32."""
    kd, c, kh, kwl = spec.kd, spec.channels, spec.kh, spec.kwl
    f = entry_forward_hw(x_flat, spec)
    s = d_stage_forward(f, spec)            # fp32; last axis kw
    pad = [(0, 0)] * (s.ndim - 1) + [(0, kwl - s.shape[-1])]
    s = jnp.pad(s, pad)
    if spec.transform == "Hartley":
        return s.reshape(kd, c * kh, kwl)
    return s.reshape(2 * kd, c * kh, kwl)


# ---------------------------------------------------------------------------
# reference (plain-jnp) block body — backward pass + numerics oracle
# ---------------------------------------------------------------------------

def _block_reference_s(x_flat, sy3, w_cat, w_cc_t, b_cat, spec: TowerSpec,
                       ds_prev=None):
    """Replay of the v5 block: inverse depth stage from the resident
    spectrum, then the tested v2 block replay, then the forward depth
    stage back to the resident layout."""
    d = spec.sizes[0]
    kd, c, kh, kwl = spec.kd, spec.channels, spec.kh, spec.kwl
    mi, _ = _d_mats(spec, _pick_p(d))
    z = jnp.einsum("dqs,sn->dqn", jnp.asarray(mi[:d], jnp.float32),
                   sy3.astype(jnp.float32).reshape(_ks(spec), -1),
                   precision=_prec(jnp.float32))
    z = z.reshape(d, 2, c, kh, kwl).astype(x_flat.dtype)
    res = _block_reference(x_flat, z, w_cat, w_cc_t, b_cat, spec,
                           ds_prev=ds_prev)
    o, f = res[0], res[1]
    s = d_stage_forward(f, spec)
    pad = [(0, 0)] * (s.ndim - 1) + [(0, kwl - s.shape[-1])]
    sf3 = jnp.pad(s, pad).reshape(_ks(spec), c * kh, kwl)
    if spec.n_ds:
        return o, sf3, res[2]
    return o, sf3


# ---------------------------------------------------------------------------
# public op with custom VJP (backward = jnp reference replay)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_tower_block_s(x_flat, sy3, w_cat, w_cc_t, b_cat, spec, interpret,
                        ds_prev=None):
    """One v5 fused tower block: (x_flat, s_y) -> (out_flat, s_f).

    Args:
        x_flat: (D, C, W*HL) block input volume.
        sy3: (KS, C*KH, KWL) fp32 resident mixed spectrum
            (``spectrum_mix_s`` of the previous block's s_f, or
            ``entry_spectrum_s`` + mix for the first block).
        w_cat / w_cc_t / b_cat / spec / interpret / ds_prev: as
            ``tower_block.fused_tower_block``.

    Returns:
        out_flat (D, C, W*HL), s_f (KS, C*KH, KWL) fp32 — the packed
        forward spectrum of out (feed ``spectrum_mix_s``) — and, when
        ``spec.n_ds``, ds (D, n_ds, W*HL) fp32 (= ``ds_prev`` + this
        block's projection; the accumulator rides the kernel).
    """
    return _fused_forward_s(x_flat, sy3, w_cat, w_cc_t, b_cat, spec,
                            interpret, ds_prev)


def _fused_forward_s(x_flat, sy3, w_cat, w_cc_t, b_cat, spec, interpret,
                     ds_prev=None):
    if not interpret and not _hw_probe_ok():
        raise RuntimeError(
            "tower_block_s (v5) is blocked on this backend: "
            f"{_HW_PROBE_WHY}. Use the "
            "v2 kernel (tower_block.py) or the default XLA module "
            "path; the v5 route unlocks automatically on a stack "
            "where the probe passes.")
    dtype = x_flat.dtype
    wp1 = _pack_weight(w_cat, dtype)
    wp2 = _pack_weight(w_cc_t, dtype)
    bias = b_cat.astype(jnp.float32)[:, None]
    return _run_tower_kernel_s(x_flat, sy3.astype(jnp.float32), wp1, wp2,
                               bias, spec, interpret, ds_prev=ds_prev)


def _fused_fwd_s(x_flat, sy3, w_cat, w_cc_t, b_cat, spec, interpret,
                 ds_prev):
    out = _fused_forward_s(x_flat, sy3, w_cat, w_cc_t, b_cat, spec,
                           interpret, ds_prev)
    return out, (x_flat, sy3, w_cat, w_cc_t, b_cat)


def _fused_bwd_s(spec, interpret, res, g):
    x_flat, sy3, w_cat, w_cc_t, b_cat = res
    # ds_prev is purely additive — differentiate the replay at zeros
    # (exact; see tower_block._fused_bwd)
    if spec.n_ds:
        zero_ds = jax.tree_util.tree_map(jnp.zeros_like, g[2])
        _, vjp = jax.vjp(
            lambda *a: _block_reference_s(*a[:5], spec=spec, ds_prev=a[5]),
            x_flat, sy3, w_cat, w_cc_t, b_cat, zero_ds)
        return vjp(g)
    _, vjp = jax.vjp(
        lambda *a: _block_reference_s(*a, spec=spec), x_flat, sy3, w_cat,
        w_cc_t, b_cat)
    return vjp(g) + (None,)


fused_tower_block_s.defvjp(_fused_fwd_s, _fused_bwd_s)
