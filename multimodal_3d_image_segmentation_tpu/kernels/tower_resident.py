"""VMEM-resident whole-tower Pallas kernel (bf16 serving path) for the
NeuralOperatorSeg family (FNOSeg / HNOSeg).

The per-block fused kernel (``tower_block.py``) still pays one full HBM
read + write of the half-res volume per block — at flagship shapes
(121x121x78, C=24) that is ~58 MB of bf16 traffic each way, 24 times,
which pins the tower at the ~200-230 GB/s relay bandwidth floor. This
kernel removes that traffic entirely: the whole flat volume stays
resident in a VMEM scratch buffer across *all* blocks (grid = blocks),
so per-block HBM traffic drops to the block's weights (~KBs).

Two algebraic moves make the depth stage feasible in-VMEM (Mosaic
cannot flatten minor dims for a D-contraction dot):

1. **The channel mix commutes with the spatial transform.** The
   reference applies the operator weights on the cropped 3D spectrum
   (``nets/hartley_operator.py:287-299``, ``nets/fourier_operator.py``)
   between transform stages; a channel contraction commutes with the
   (channel-independent) DFT stages, so block *b*'s mix runs inside
   block *b-1*'s plane loop as one extra MXU dot on the spatial planes
   (``W @ out``; Fourier's complex weight becomes two real dots:
   ``W·F(out) = F(Wr·out) + i·F(Wi·out)``). The frequency-domain SELU
   (Hartley) still applies to the fully folded 3D spectrum, preserving
   the reference's pad-then-SELU-then-inverse order.

2. **The D-stage runs as rank-1 VPU accumulation.** Instead of a
   D-contraction matmul (which would need a minor-dim reshape), each
   plane accumulates ``s += f_p ⊗ A[p]`` into a tiny fp32 spectrum
   scratch (~1.5 MB), and the inverse D-stage is the mirrored
   broadcast-reduce per plane. ~3 M VPU FLOPs per plane — noise next
   to the MXU work.

Backward pass: custom VJP replaying a pure-jnp reference chain (the
same scan the module path runs), as for the per-block kernel.

Reference structure being fused: ``nets/architectures.py:511-608`` (the
24-block tower), ``nets/hartley_operator.py:168-271`` /
``nets/fourier_operator.py:109-211`` (per-block transform pairs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tower_block import (TowerSpec, _block_reference, _kdot, _kernel_mats,
                          _selu, _spec_mats, block_spectrum_update,
                          d_stage_forward, entry_forward_hw)

__all__ = ["resident_tower"]


@functools.lru_cache(maxsize=32)
def _d_mats(spec: TowerSpec):
    """fp32 (D, KD) depth-stage matrices in plane-row-read layout.

    Hartley: forward 'fold' pair (C−S, −(C+S)); inverse 'first' pair
    (Ci^T, Si^T). Fourier: forward (C, S) of e^{−iθ}/D; inverse
    (Ci^T, Si^T) of e^{+iθ}.
    """
    m = _spec_mats(spec)
    cd, sd = m["md_fwd"]          # (D, KD)
    cdi, sdi = m["md_inv"]        # (KD, D)
    if spec.transform == "Hartley":
        fa, fb = cd - sd, -(cd + sd)
    else:
        fa, fb = cd, sd
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    return f32(fa), f32(fb), f32(cdi.T), f32(sdi.T)


def _resident_kernel(x_in, s0_ref, wcat_ref, wcc_ref, bias_ref, wpre_ref,
                     mwi, mhia, mhib, mhf, mwf, mda, mdb, mdci, mdsi,
                     out_ref, *scratch, spec: TowerSpec, nb: int,
                     tpu_mode: bool):
    if tpu_mode:
        x_res, s_cur, s_nxt, sem = scratch
    else:
        s_cur, s_nxt = scratch
        x_res = out_ref
    i = pl.program_id(0)
    c = spec.channels
    d, h, w = spec.sizes
    hl, kh, kw = spec.hl, spec.kh, spec.kwl
    kd = spec.kd
    npl = w * hl
    fourier = spec.transform == "Fourier"

    @pl.when(i == 0)
    def _init():
        if tpu_mode:
            dma = pltpu.make_async_copy(x_in, x_res, sem)
            dma.start()
            dma.wait()
        else:
            x_res[...] = x_in[...]
        s_cur[...] = s0_ref[...]

    s_nxt[...] = jnp.zeros_like(s_nxt)

    wc = wcat_ref[0]      # (2C, C) bf16
    wt = wcc_ref[0]       # (C, C) bf16
    bv = bias_ref[0]      # (2C, 1) f32
    wp = wpre_ref[0]      # (PR, C, C) bf16

    def _fwd_hw(m):
        """(C, NPL) f32 -> per-plane partial spectra (C*KH, KW) f32 x2."""
        o2 = m.reshape(c, w, hl).reshape(c * w, hl).astype(jnp.bfloat16)
        fcs = _kdot(o2, mhf[...])                       # (CW, 2KH)
        fcs = fcs.reshape(c, w, 2 * kh)
        fcs = jnp.swapaxes(fcs, 1, 2).reshape(c * 2 * kh, w)
        gg = _kdot(fcs.astype(jnp.bfloat16), mwf[...])  # (C2KH, 2KW)
        ga = gg[:, :kw].reshape(c, 2, kh, kw)
        gb = gg[:, kw:].reshape(c, 2, kh, kw)
        gre = (ga[:, 0] - gb[:, 1]).reshape(c * kh, kw)
        gim = (gb[:, 0] + ga[:, 1]).reshape(c * kh, kw)
        return gre, gim

    def _plane(p, carry):
        # ---- inverse D stage for THIS plane: broadcast-reduce over KD
        s = s_cur[...]                                  # (S, CKH, KW) f32
        # dynamic row reads stay 2-D (1, KD) then transpose: Mosaic
        # crashes lowering a 1-D dynamic read reshaped straight to 3-D
        _row = lambda m: jnp.swapaxes(  # noqa: E731
            m[pl.ds(p, 1), :], 0, 1).reshape(kd, 1, 1)
        ca = _row(mdci)
        sa = _row(mdsi)
        if fourier:
            sre, sim = s[:kd], s[kd:]
            zre = jnp.sum(sre * ca - sim * sa, axis=0)  # (CKH, KW)
            zim = jnp.sum(sre * sa + sim * ca, axis=0)
        else:
            zre = jnp.sum(s * ca, axis=0)
            zim = jnp.sum(s * sa, axis=0)
        z2 = jnp.concatenate([zre, zim], axis=0)        # (2CKH, KW)

        # ---- inverse HW stages (same shapes as the per-block kernel)
        ab = _kdot(z2.astype(jnp.bfloat16), mwi[...])   # (2CKH, 2W)
        a = ab[:, :w].reshape(2, c, kh, w)
        b = ab[:, w:].reshape(2, c, kh, w)
        y = jnp.stack([a[0] - b[1], b[0] + a[1]])       # (2, C, KH, W)
        y = jnp.swapaxes(y, 2, 3).reshape(2, c * w, kh)
        y1 = (_kdot(y[0].astype(jnp.bfloat16), mhia[...])
              + _kdot(y[1].astype(jnp.bfloat16), mhib[...]))  # (CW, HL)

        # ---- block tail on the resident volume (in place)
        x = x_res[p]                                    # (C, NPL) bf16
        pq = _kdot(wc, x) + bv                          # (2C, NPL) f32
        t = _selu(y1.reshape(c, npl) + pq[:c])
        o = _selu(_kdot(wt, t.astype(jnp.bfloat16)) + pq[c:])
        x_res[p] = o.astype(x_res.dtype)

        # ---- NEXT block's channel mix (commuted) + forward stages +
        # forward D-stage rank-1 accumulation
        ob = o.astype(jnp.bfloat16)
        m1 = _kdot(wp[0], ob)                           # (C, NPL) f32
        g1re, g1im = _fwd_hw(m1)
        fa = _row(mda)
        fb = _row(mdb)
        if fourier:
            m2 = _kdot(wp[1], ob)
            g2re, g2im = _fwd_hw(m2)
            fre = g1re - g2im
            fim = g1im + g2re
            s_nxt[:kd] += fre[None] * fa - fim[None] * fb
            s_nxt[kd:] += fre[None] * fb + fim[None] * fa
        else:
            s_nxt[...] += g1re[None] * fa + g1im[None] * fb
        return carry

    jax.lax.fori_loop(0, d, _plane, 0)

    sn = s_nxt[...]
    # Hartley applies SELU on the folded 3D spectrum (the reference's
    # frequency-domain SELU, ``nets/hartley_operator.py:265-267``);
    # Fourier has no frequency nonlinearity.
    s_cur[...] = sn if fourier else _selu(sn)

    @pl.when(i == nb - 1)
    def _fin():
        if tpu_mode:
            dma = pltpu.make_async_copy(x_res, out_ref, sem)
            dma.start()
            dma.wait()


def _prep_s0(f0, op0, spec: TowerSpec):
    """XLA-side spectrum for block 1: mix with its operator weight, fold
    through the forward D stage, apply the frequency SELU (Hartley)."""
    kd, kh, kw = spec.kd, spec.kh, spec.kw
    c = spec.channels
    if spec.transform == "Hartley":
        f0m = jnp.einsum("dqcxy,oc->dqoxy", f0, op0[0])
        s = d_stage_forward(f0m, spec)                  # (KD, C, KH, KW)
        s = jax.nn.selu(s)
        return s.reshape(kd, c * kh, kw)
    wr, wi = op0[0], op0[1]
    re = (jnp.einsum("dcxy,oc->doxy", f0[:, 0], wr)
          - jnp.einsum("dcxy,oc->doxy", f0[:, 1], wi))
    im = (jnp.einsum("dcxy,oc->doxy", f0[:, 1], wr)
          + jnp.einsum("dcxy,oc->doxy", f0[:, 0], wi))
    f0m = jnp.stack([re, im], axis=1)
    s = d_stage_forward(f0m, spec)                      # (2, KD, C, KH, KW)
    return s.reshape(2 * kd, c * kh, kw)


def _run_resident(x_flat, s0, wpre, wcat, wcc, bias, spec: TowerSpec,
                  nb: int, interpret: bool):
    d = spec.sizes[0]
    c, kh, kw = spec.channels, spec.kh, spec.kwl
    npl = x_flat.shape[-1]
    ss = s0.shape[0]
    pr = wpre.shape[1]
    tpu_mode = not interpret

    km = _kernel_mats(spec, False)
    mats = [km[0], km[1], km[2], km[3], km[5]]
    dmats = list(_d_mats(spec))

    kernel = functools.partial(_resident_kernel, spec=spec, nb=nb,
                               tpu_mode=tpu_mode)

    def _full(m):
        return pl.BlockSpec(m.shape, lambda i, n=m.ndim: (0,) * n,
                            memory_space=pltpu.VMEM)

    x_spec = (pl.BlockSpec(memory_space=pl.ANY) if tpu_mode
              else pl.BlockSpec((d, c, npl), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM))
    out_spec = (pl.BlockSpec(memory_space=pl.ANY) if tpu_mode
                else pl.BlockSpec((d, c, npl), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((ss, c * kh, kw), jnp.float32),
               pltpu.VMEM((ss, c * kh, kw), jnp.float32)]
    if tpu_mode:
        scratch = ([pltpu.VMEM((d, c, npl), x_flat.dtype)] + scratch
                   + [pltpu.SemaphoreType.DMA(())])

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            x_spec,
            _full(s0),
            pl.BlockSpec((1, 2 * c, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pr, c, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[_full(m) for m in mats],
            *[_full(m) for m in dmats],
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((d, c, npl), x_flat.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, s0, wcat, wcc, bias, wpre, *mats, *dmats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def resident_tower(x_flat, op_stack, wcat_stack, wcc_stack, b_stack,
                   spec, interpret):
    """Whole tower in one VMEM-resident Pallas call.

    Args:
        x_flat: (D, C, W*HL) bf16 block-0 input volume.
        op_stack: (B, PR, C, C) operator weights (PR=1 Hartley real
            weight, PR=2 Fourier real/imag), reference (O, I) layout.
        wcat_stack: (B, 2C, C) stacked [conv_branch ; conv_concat-x].
        wcc_stack: (B, C, C) conv_concat matrices for the mixed branch.
        b_stack: (B, 2C) stacked [zeros ; conv_concat bias].
        spec: TowerSpec (static); ``spec.n_ds`` must be 0.
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        out_flat (D, C, W*HL) bf16 after all B blocks.
    """
    return _resident_forward(x_flat, op_stack, wcat_stack, wcc_stack,
                             b_stack, spec, interpret)


def _resident_forward(x_flat, op_stack, wcat_stack, wcc_stack, b_stack,
                      spec, interpret):
    assert spec.n_ds == 0, "resident tower path has no deep supervision"
    nb = op_stack.shape[0]
    c = spec.channels
    pr = op_stack.shape[1]

    f0 = entry_forward_hw(x_flat.astype(jnp.float32), spec)
    if f0.shape[-1] != spec.kw:
        f0 = f0[..., :spec.kw]
    s0 = _prep_s0(f0, op_stack[0].astype(jnp.float32), spec)
    s0 = s0.astype(jnp.float32)

    wpre = jnp.concatenate(
        [op_stack[1:], jnp.zeros((1, pr, c, c), op_stack.dtype)], axis=0)
    return _run_resident(
        x_flat, s0, wpre.astype(jnp.bfloat16),
        wcat_stack.astype(jnp.bfloat16), wcc_stack.astype(jnp.bfloat16),
        b_stack.astype(jnp.float32)[..., None], spec, nb, interpret)


def _reference_chain(x_flat, op_stack, wcat_stack, wcc_stack, b_stack,
                     spec):
    """Pure-jnp replay of the whole tower (backward oracle)."""
    # f rides the input dtype to match _block_reference's output
    # contract (it emits f in the volume dtype, like the fused kernel)
    f = entry_forward_hw(x_flat, spec)

    def body(carry, wts):
        xf, fv = carry
        op, wc, wt, b = wts
        opt = ((op[0],) if spec.transform == "Hartley"
               else (op[0], op[1]))
        z = block_spectrum_update(fv, opt, spec)
        xf, fv = _block_reference(xf, z, wc, wt, b, spec)[:2]
        return (xf, fv), None

    (xf, _), _ = jax.lax.scan(
        body, (x_flat, f), (op_stack, wcat_stack, wcc_stack, b_stack))
    return xf


def _resident_fwd(x_flat, op_stack, wcat_stack, wcc_stack, b_stack,
                  spec, interpret):
    out = _resident_forward(x_flat, op_stack, wcat_stack, wcc_stack,
                            b_stack, spec, interpret)
    return out, (x_flat, op_stack, wcat_stack, wcc_stack, b_stack)


def _resident_bwd(spec, interpret, res, g):
    x_flat, op_stack, wcat_stack, wcc_stack, b_stack = res
    _, vjp = jax.vjp(
        lambda *a: _reference_chain(*a, spec=spec), x_flat, op_stack,
        wcat_stack, wcc_stack, b_stack)
    return vjp(g.astype(x_flat.dtype))


resident_tower.defvjp(_resident_fwd, _resident_bwd)
