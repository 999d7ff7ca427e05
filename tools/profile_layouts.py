"""Layout experiments: channels-last vs channel-first on the real TPU.

Hypothesis: with 4-48 channels, channels-last puts a tiny dim on the lane
axis (padded to 128) and wastes up to 32x HBM bandwidth; channel-first puts
large spatial dims minor and should run near speed-of-light.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu.ops import spectral
from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((24, 24)).astype(np.float32) * 0.1)
wcat = jnp.asarray(rng.standard_normal((48, 24)).astype(np.float32) * .1)
modes = (10, 14, 14)


def report(name, fn, x, **kw):
    ms = timed_loop_ms(fn, x, **kw)
    print(f"{name:58s} {ms:9.3f} ms", flush=True)


# conv_concat analog
xl = jnp.asarray(rng.standard_normal((1, 121, 121, 78, 24)).astype(np.float32))
xf = jnp.asarray(rng.standard_normal((1, 24, 121, 121, 78)).astype(np.float32))

report("concat-conv channels-LAST  '...i,io->...o'",
       lambda v: jax.nn.selu(jnp.einsum("...i,io->...o", v, wcat[:24])
                             + jnp.einsum("...i,io->...o", v, wcat[24:])), xl)
report("concat-conv channel-FIRST  'oi,bidhw->bodhw'",
       lambda v: jax.nn.selu(jnp.einsum("oi,bidhw->bodhw", wcat[:24].T, v)
                             + jnp.einsum("oi,bidhw->bodhw", wcat[24:].T, v)),
       xf)

# bf16 variants
xlb = xl.astype(jnp.bfloat16)
xfb = xf.astype(jnp.bfloat16)
wcb = wcat.astype(jnp.bfloat16)
report("concat-conv channels-LAST bf16",
       lambda v: jax.nn.selu(jnp.einsum("...i,io->...o", v, wcb[:24])
                             + jnp.einsum("...i,io->...o", v, wcb[24:])), xlb)
report("concat-conv channel-FIRST bf16",
       lambda v: jax.nn.selu(jnp.einsum("oi,bidhw->bodhw", wcb[:24].T, v)
                             + jnp.einsum("oi,bidhw->bodhw", wcb[24:].T, v)),
       xfb)

# spectral transforms channel-first (axes 2,3,4)
report("dht_crop channel-FIRST",
       lambda v: spectral.dht_crop(v, modes, axes=(2, 3, 4)), xf)
packed_f = spectral.dht_crop(xf, modes, axes=(2, 3, 4))
report("dht_pad_inverse channel-FIRST",
       lambda v: spectral.dht_pad_inverse(v, (121, 121, 78), axes=(2, 3, 4)),
       packed_f)

# resize
from multimodal_3d_image_segmentation_tpu.ops.resize import resize_linear

xs4l = jnp.asarray(rng.standard_normal((1, 121, 121, 78, 4)).astype(np.float32))
xs4f = jnp.asarray(rng.standard_normal((1, 4, 121, 121, 78)).astype(np.float32))


def resize_cf(v, sizes):
    # channel-first: gather over axes 2..4
    for ax, n_out in zip((2, 3, 4), sizes):
        n_in = v.shape[ax]
        if n_in == n_out:
            continue
        from multimodal_3d_image_segmentation_tpu.ops.resize import _linear_taps_np
        lo, hi, w_hi = _linear_taps_np(n_in, int(n_out))
        shape = [1] * v.ndim
        shape[ax] = n_out
        ww = jnp.asarray(w_hi, v.dtype).reshape(shape)
        v_lo = jnp.take(v, jnp.asarray(lo), axis=ax)
        v_hi = jnp.take(v, jnp.asarray(hi), axis=ax)
        v = v_lo + (v_hi - v_lo) * ww
    return v


report("resize gather channels-LAST 4ch ->240^3",
       lambda v: resize_linear(v, (240, 240, 155)), xs4l)
report("resize gather channel-FIRST 4ch ->240^3",
       lambda v: resize_cf(v, (240, 240, 155)), xs4f)


def resize_mat_cf(v, sizes):
    for ax, n_out in zip((2, 3, 4), sizes):
        n_in = v.shape[ax]
        if n_in == n_out:
            continue
        from multimodal_3d_image_segmentation_tpu.ops.resize import _linear_taps_np
        lo, hi, w_hi = _linear_taps_np(n_in, int(n_out))
        mat = np.zeros((n_in, n_out), np.float32)
        mat[lo, np.arange(n_out)] += 1 - w_hi
        mat[hi, np.arange(n_out)] += w_hi
        m = jnp.asarray(mat, v.dtype)
        subs = "abcde"
        out = subs[:ax] + "z" + subs[ax + 1:]
        v = jnp.einsum(f"{subs[:v.ndim]},{subs[ax]}z->{out}", v, m,
                       precision=jax.lax.Precision.DEFAULT)
    return v


report("resize matmul channel-FIRST 4ch ->240^3 (default prec)",
       lambda v: resize_mat_cf(v, (240, 240, 155)), xs4f)

# conv_in channel-first via space-to-depth matmul
x_in_f = jnp.asarray(rng.standard_normal((1, 4, 240, 240, 156)).astype(np.float32))
win = jnp.asarray(rng.standard_normal((32, 24)).astype(np.float32) * .1)


def conv_in_s2d(v):
    b, c, d, h, wd = v.shape
    v = v.reshape(b, c, d // 2, 2, h // 2, 2, wd // 2, 2)
    v = v.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, c * 8, d // 2,
                                                    h // 2, wd // 2)
    return jnp.einsum("oi,bidhw->bodhw", win.T, v)


report("conv_in as space-to-depth matmul channel-FIRST", conv_in_s2d, x_in_f)

x_in_l = jnp.asarray(rng.standard_normal((1, 240, 240, 156, 4)).astype(np.float32))
wconv = jnp.asarray(rng.standard_normal((2, 2, 2, 4, 24)).astype(np.float32) * .1)
report("conv_in lax.conv channels-LAST",
       lambda v: jax.lax.conv_general_dilated(
           v, wconv, (2, 2, 2), [(0, 0)] * 3,
           dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x_in_l)
