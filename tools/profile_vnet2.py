"""V-Net-DS non-conv cost breakdown + whole model after the DS-leg fix."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.ops.resize import (resize_linear,
                                                             resize_nearest)
from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

rng = np.random.default_rng(0)


def t(name, fn, x, n_long=5):
    ms = timed_loop_ms(fn, x, n_short=1, n_long=n_long, repeats=3)
    print(f"{name:44s} {ms:7.2f} ms", flush=True)
    return ms


def arr(shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def main():
    print("== whole model (after DS project-then-upsample) ==", flush=True)
    model = models.VNetDS(4, 4, 24, [1, 2, 3, 3, 3],
                          right_leg_indexes=[0, 1, 2, 3, 4])
    x = arr((1, 4, 240, 240, 155))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    ms = timed_loop_ms(lambda v: model.apply({"params": params}, v), x,
                       n_short=1, n_long=4, repeats=3)
    print(f"VNetDS total: {ms:.2f} ms ({1000/ms:.2f} vol/s, "
          f"{330/ms:.2f}x V100)", flush=True)

    print("== suspects ==", flush=True)
    # input: channel-first -> channels-last transpose at full res
    xcf = arr((1, 4, 240, 240, 155))
    t("to_channels_last 240^3x4", lambda v: jnp.transpose(
        v, (0, 2, 3, 4, 1)) * 1.000001, xcf)

    # conv_in: k2 s2 pad1 4->24 at 240x240x155 (channels-last)
    xin = arr((1, 240, 240, 155, 4))
    k_in = arr((2, 2, 2, 4, 24)) * 0.05
    t("conv_in k2s2 4->24 @240 (xla)", lambda v: lax.conv_general_dilated(
        v, k_in, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), xin)

    # GroupNorm(1)+ELU at L0 size
    x0 = arr((1, 120, 120, 78, 24))
    import flax.linen as nn
    gn = nn.GroupNorm(num_groups=1, epsilon=1e-5)
    gp = gn.init(jax.random.PRNGKey(0), x0)
    t("GN(1)+ELU @120x120x78x24", lambda v: nn.elu(
        gn.apply(gp, v)), x0)

    # decoder concat at L0
    t("concat 24+24 @120x120x78", lambda v: jnp.concatenate(
        [v, v + 1.0], axis=-1), x0)

    # convtranspose k3 s2 48->24 from 60^3
    x1 = arr((1, 60, 60, 39, 48))
    k_t = arr((3, 3, 3, 48, 24)) * 0.05
    def trans(v):
        flipped = jnp.flip(k_t, axis=(0, 1, 2))
        return lax.conv_general_dilated(
            v, flipped, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    t("convtranspose k3s2 48->24 60->120", trans, x1)

    # stride-2 down conv at L0 (24->24)
    k_d = arr((3, 3, 3, 24, 24)) * 0.05
    t("down k3s2 24->24 @120", lambda v: lax.conv_general_dilated(
        v, k_d, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x0)

    # output tail: 1x1 24->4 + trilinear 120->240 + softmax + transpose
    wout = arr((24, 4)) * 0.1
    def tail(v):
        y = jnp.einsum("...i,io->...o", v, wout)
        y = resize_linear(y, (240, 240, 155))
        y = jax.nn.softmax(y, axis=-1)
        return jnp.transpose(y, (0, 4, 1, 2, 3))
    t("tail 1x1+trilinear+softmax+tr", tail, x0)

    # old-style DS legs for comparison: upsample 384ch 8x8x5 -> 120x120x78
    x4 = arr((1, 8, 8, 5, 384))
    t("OLD ds leg: nearest 384ch -> 120^3", lambda v: resize_nearest(
        v, (120, 120, 78)) * 1.000001, x4, n_long=3)
    t("NEW ds leg: 1x1 then nearest 4ch", lambda v: resize_nearest(
        jnp.einsum("...i,io->...o", v, arr((384, 4))), (120, 120, 78))
        * 1.000001, x4)


if __name__ == "__main__":
    main()
