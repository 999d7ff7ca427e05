"""Round 2 layout experiments: flattened-spatial channel mixes, strided
conv_in, folded complex inverse."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

rng = np.random.default_rng(0)
V = 121 * 121 * 78
wcat = jnp.asarray(rng.standard_normal((48, 24)).astype(np.float32) * .1)


def report(name, fn, x, **kw):
    print(f"{name:58s} {timed_loop_ms(fn, x, **kw):9.3f} ms", flush=True)


# flattened channel-first 1x1 channel mix
xflat = jnp.asarray(rng.standard_normal((1, 24, V)).astype(np.float32))
report("concat-conv FLATTENED 'oi,bis->bos' fp32",
       lambda v: jax.nn.selu(jnp.einsum("oi,bis->bos", wcat[:24].T, v)
                             + jnp.einsum("oi,bis->bos", wcat[24:].T, v)),
       xflat)
report("concat-conv FLATTENED bf16",
       lambda v: jax.nn.selu(
           jnp.einsum("oi,bis->bos", wcat[:24].T.astype(jnp.bfloat16), v)
           + jnp.einsum("oi,bis->bos", wcat[24:].T.astype(jnp.bfloat16), v)),
       xflat.astype(jnp.bfloat16))

# pure elementwise on both layouts (bandwidth reference)
report("selu only FLATTENED (110MB)", lambda v: jax.nn.selu(v), xflat)

# conv_in: strided-slice einsum accumulation, channel-first input
x_cf = jnp.asarray(rng.standard_normal((1, 4, 240, 240, 156)).astype(np.float32))
w8 = [jnp.asarray(rng.standard_normal((24, 4)).astype(np.float32) * .1)
      for _ in range(8)]


def conv_in_strided(v):
    out = None
    k = 0
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                sl = v[:, :, dz::2, dy::2, dx::2]
                b, c, d, h, wd = sl.shape
                part = jnp.einsum("oi,bis->bos", w8[k],
                                  sl.reshape(b, c, -1))
                out = part if out is None else out + part
                k += 1
    return jax.nn.selu(out)


report("conv_in strided-slice einsum channel-first", conv_in_strided, x_cf)

# folded complex inverse prototype: packed (B, C, 20, 28, 28) -> (121,121,78)
from multimodal_3d_image_segmentation_tpu.ops.spectral import _dft_mats_np

packed = jnp.asarray(rng.standard_normal((1, 24, 20, 28, 28)).astype(np.float32))


def make_mats(n, m):
    c, s = _dft_mats_np(n, m, False, False, -1)  # (2m, n)
    return (jnp.asarray(c, jnp.float32), jnp.asarray(s, jnp.float32))


mats = {2: make_mats(121, 10), 3: make_mats(121, 14), 4: make_mats(78, 14)}


def inverse_folded(v):
    # axis 4 (w): real -> comp(2): output (..., n_w, 2)
    c, s = mats[4]
    m0 = jnp.stack([c, s], axis=-1)  # (2m, n, 2)
    v = jnp.einsum("bcdhw,wnq->bcdhnq", v, m0)
    # axis 3 (h): comp -> comp
    c, s = mats[3]
    m1 = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], 1)
    # m1[a, p, k, q]: (2m, 2, n, 2)
    v = jnp.einsum("bcdhnq,hqkp->bcdknp", v, m1.transpose(0, 3, 2, 1))
    # wait—simpler: treat (h, comp) jointly
    return v


# simpler correct folded inverse: big einsum per axis with comp axis
def inverse_folded2(v):
    # state: (B, C, d_modes, h_modes, w_modes); add comp axis q
    c, s = mats[4]
    m_w = jnp.stack([c, s], axis=-1)                      # (2m_w, n_w, 2)
    v = jnp.einsum("bcdhw,wnq->bcdhqn", v, m_w)           # comp before spatial-minor
    c, s = mats[3]
    m_h = jnp.stack([jnp.stack([c, s], -1),               # p=0 (re): (C, S)?
                     jnp.stack([-s, c], -1)], 1)          # p=1 (im)
    # (re+i im)(C+iS): re' = re C - im S ; im' = im C + re S
    # m_h[a, p, k, q]: q=0: re' coeff: p=0->C, p=1->-S ; q=1: p=0->S, p=1->C
    m_h = jnp.stack([jnp.stack([c, s], -1),
                     jnp.stack([-s, c], -1)], axis=1)     # (2m, 2, n, 2)
    v = jnp.einsum("bcdhqn,hqkp->bcdkpn", v, m_h)
    c, s = mats[2]
    m_d = jnp.stack([c - s, -(c + s)], axis=1)            # (2m, 2, n): Re-Im fold
    v = jnp.einsum("bcdkpn,dpj->bcjkn", v, m_d)
    return v


report("dht_pad_inverse FOLDED comp-axis channel-first",
       inverse_folded2, packed)

from multimodal_3d_image_segmentation_tpu.ops import spectral
report("dht_pad_inverse CURRENT channel-first",
       lambda v: spectral.dht_pad_inverse(v, (121, 121, 78), axes=(2, 3, 4)),
       packed)

# correctness check of folded inverse vs current
a = np.asarray(inverse_folded2(packed))
b = np.asarray(spectral.dht_pad_inverse(packed, (121, 121, 78),
                                        axes=(2, 3, 4)))
print("folded inverse max err:", np.abs(a - b).max(),
      "(shapes", a.shape, b.shape, ")")
