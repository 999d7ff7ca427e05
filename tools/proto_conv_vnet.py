"""Prototype: Pallas streaming-stencil 3D k=3/s=1 conv for small channels.

V-Net-DS's k3 convs at C in {24,48} run at ~4.7 TF/s through XLA: with
channels on every matmul dim, the 128x128 MXU is (24/128)^2 utilized.
This kernel restructures the contraction:

  * layout (C, D, Hp*Wp): the padded (H, W) plane is FLATTENED onto the
    lane axis, so the 9 in-plane taps become lane rolls (exact at every
    interior position; wrap effects land only in pad lanes);
  * per source plane, one MXU dot computes all 3 depth taps at once:
      P[(kd*co), lanes] = W72[(kd*co), (t*ci)] @ Xcol[(t*ci), lanes]
    M = 3*co (72/144), K = 9*ci (216/432), N = plane — MXU utilization
    jumps from ~3.5% to ~50%;
  * a two-register pending-plane pipeline (A, B) accumulates the three
    depth contributions across sequential grid steps, writing each output
    plane once.

Validated here against lax.conv at fp32 HIGHEST before integration.
"""
import sys
sys.path.insert(0, "/root/repo")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms


def _kernel(x_ref, w_ref, o_ref, a_ref, b_ref, xcol_ref, *,
            ci, co, wp, npl, precision):
    i = pl.program_id(0)
    xplane = x_ref[0]  # (ci, Npl)
    # in-plane taps: Xcol[t*ci:(t+1)*ci] = plane shifted by (kh-1, kw-1)
    for t in range(9):
        kh, kw = divmod(t, 3)
        off = (kh - 1) * wp + (kw - 1)
        # want Xcol[t][j] = xplane[j + off]; roll(v, s)[j] = v[j - s],
        # so s = -off mod Npl (roll requires non-negative shifts)
        xcol_ref[t * ci:(t + 1) * ci, :] = pltpu.roll(xplane,
                                                      (-off) % npl, 1)
    dims = (((1,), (0,)), ((), ()))
    if precision == "bf16x3":
        # Mosaic lacks Precision.HIGH; emulate bf16x3 with a hi/lo split
        # (same error class as XLA's HIGH: ~1e-6 relative)
        wv, xv = w_ref[:], xcol_ref[:]
        whi = wv.astype(jnp.bfloat16)
        wlo = (wv - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        xhi = xv.astype(jnp.bfloat16)
        xlo = (xv - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        p = (lax.dot_general(whi, xhi, dims,
                             preferred_element_type=jnp.float32)
             + lax.dot_general(whi, xlo, dims,
                               preferred_element_type=jnp.float32)
             + lax.dot_general(wlo, xhi, dims,
                               preferred_element_type=jnp.float32))
    else:
        p = lax.dot_general(w_ref[:], xcol_ref[:], dims,
                            preferred_element_type=jnp.float32,
                            precision=precision)  # (3*co, Npl)
    o_ref[0] = (b_ref[:] + p[2 * co:3 * co]).astype(o_ref.dtype)
    b_ref[:] = a_ref[:] + p[co:2 * co]
    a_ref[:] = p[0:co]


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def conv3_flat(x, kernel, interpret=False, precision="highest"):
    """x: (D, H, W, C) fp32; kernel: (3,3,3,ci,co). Returns (D, H, W, co).
    SAME zero padding, stride 1."""
    d, h, w, ci = x.shape
    co = kernel.shape[-1]
    hp, wp = h + 2, w + 2
    np_ = hp * wp
    npl = -(-np_ // 128) * 128

    xt = jnp.transpose(x, (0, 3, 1, 2))           # (D, C, H, W)
    xt = jnp.pad(xt, ((1, 1), (0, 0), (1, 1), (1, 1)))
    xt = xt.reshape(d + 2, ci, np_)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, npl - np_)))

    # W72[(kd*co + o), (t*ci + i)] = K[kd, kh, kw, i, o]
    w72 = jnp.transpose(kernel.reshape(3, 9, ci, co), (0, 3, 1, 2))
    w72 = w72.reshape(3 * co, 9 * ci)

    prec = ("bf16x3" if precision == "bf16x3"
            else dict(default=lax.Precision.DEFAULT,
                      highest=lax.Precision.HIGHEST)[precision])
    kern = functools.partial(_kernel, ci=ci, co=co, wp=wp, npl=npl,
                             precision=prec)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((d + 2, co, npl), x.dtype),
        grid=(d + 2,),
        in_specs=[
            pl.BlockSpec((1, ci, npl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * co, 9 * ci), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co, npl),
                               lambda i: (jnp.maximum(i - 2, 0), 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((co, npl), jnp.float32),
                        pltpu.VMEM((co, npl), jnp.float32),
                        pltpu.VMEM((9 * ci, npl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xt, w72)
    out = out[:d]                                  # (D, co, Npl)
    out = out[:, :, :np_].reshape(d, co, hp, wp)[:, :, 1:h + 1, 1:w + 1]
    return jnp.transpose(out, (0, 2, 3, 1))


def _xla_conv(x, kernel):
    return lax.conv_general_dilated(
        x[None], kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=lax.Precision.HIGHEST)[0]


def check(d, h, w, ci, co, interpret):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((d, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.05,
                    jnp.float32)
    ref = _xla_conv(x, k)
    for precision in ("highest", "bf16x3"):
        got = conv3_flat(x, k, interpret=interpret, precision=precision)
        err = float(jnp.max(jnp.abs(got - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"  ({d},{h},{w}) {ci}->{co} prec={precision}: "
              f"rel err {err:.2e}", flush=True)
    if not interpret:
        for precision in ("highest", "bf16x3"):
            f = functools.partial(conv3_flat, kernel=k, precision=precision)
            ms = timed_loop_ms(lambda v: f(v), x, n_short=1, n_long=7,
                               repeats=3)
            gf = 2 * 27 * ci * co * d * h * w / 1e9
            print(f"  pallas {precision}: {ms:7.2f} ms  {gf/ms:6.2f} TF/s",
                  flush=True)
        ms = timed_loop_ms(lambda v: _xla_conv(v, k), x, n_short=1,
                           n_long=5, repeats=3)
        gf = 2 * 27 * ci * co * d * h * w / 1e9
        print(f"  xla highest:  {ms:7.2f} ms  {gf/ms:6.2f} TF/s", flush=True)


if __name__ == "__main__":
    interpret = jax.default_backend() != "tpu"
    print(f"backend: {jax.default_backend()} (interpret={interpret})",
          flush=True)
    check(8, 10, 12, 8, 16, interpret)   # odd small shape, ci != co
    if not interpret:
        check(120, 120, 78, 24, 24, False)
        check(120, 120, 78, 48, 24, False)
        check(60, 60, 39, 48, 48, False)
        check(60, 60, 39, 24, 48, False)
        check(60, 60, 39, 96, 48, False)
        check(30, 30, 20, 96, 96, False)
