"""Per-component timing for V-Net-DS at the flagship 240x240x155 input.

Identifies where the model's time goes: each distinct conv shape class
(level x encoder/decoder x kernel/stride), the deep-supervision leg, and
the whole model. Timing via the chained-fori_loop protocol.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

F = 24


def conv_case(name, cin, cout, spatial, k=3, s=1):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1,) + spatial + (cin,)),
                    jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)) * 0.05,
                    jnp.float32)

    def fn(v):
        return lax.conv_general_dilated(
            v, w, (s, s, s), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    ms = timed_loop_ms(fn, x, n_short=1, n_long=5, repeats=3)
    vox = int(np.prod(spatial)) // (s ** 3)
    gf = 2 * (k ** 3) * cin * cout * vox / 1e9
    print(f"{name:28s} {cin:4d}->{cout:4d} k{k}s{s} @{spatial}: "
          f"{ms:7.2f} ms  {gf:7.1f} GF  {gf/ms:6.2f} TF/s", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    print("== whole model ==", flush=True)
    model = models.VNetDS(4, 4, F, [1, 2, 3, 3, 3],
                          right_leg_indexes=[0, 1, 2, 3, 4])
    x = jnp.asarray(rng.standard_normal((1, 4, 240, 240, 155)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    ms = timed_loop_ms(lambda v: model.apply({"params": params}, v), x,
                       n_short=1, n_long=4, repeats=3)
    print(f"VNetDS total: {ms:.2f} ms/volume ({1000/ms:.2f} vol/s, "
          f"{330/ms:.2f}x V100)", flush=True)

    print("== conv shape classes ==", flush=True)
    total = 0.0
    total += conv_case("encode_0_conv", F, F, (120, 120, 78))
    total += conv_case("encode_0_down", F, F, (120, 120, 78), s=2)
    total += conv_case("encode_1_conv0", F, 2 * F, (60, 60, 39))
    total += 2 * conv_case("encode_1_conv1", 2 * F, 2 * F, (60, 60, 39))
    total += conv_case("encode_1_down", 2 * F, 2 * F, (60, 60, 39), s=2)
    total += conv_case("encode_2_conv0", 2 * F, 4 * F, (30, 30, 20))
    total += 2 * conv_case("encode_2_conv1", 4 * F, 4 * F, (30, 30, 20))
    total += conv_case("encode_2_down", 4 * F, 4 * F, (30, 30, 20), s=2)
    total += conv_case("encode_3_conv0", 4 * F, 8 * F, (15, 15, 10))
    total += 2 * conv_case("encode_3_conv1", 8 * F, 8 * F, (15, 15, 10))
    total += conv_case("encode_3_down", 8 * F, 8 * F, (15, 15, 10), s=2)
    total += conv_case("encode_4_conv0", 8 * F, 16 * F, (8, 8, 5))
    total += 2 * conv_case("encode_4_conv1", 16 * F, 16 * F, (8, 8, 5))
    total += 3 * conv_case("decode_3_conv", 16 * F, 8 * F, (15, 15, 10))
    total += 3 * conv_case("decode_2_conv", 8 * F, 4 * F, (30, 30, 20))
    total += conv_case("decode_1_conv0", 4 * F, 2 * F, (60, 60, 39))
    total += conv_case("decode_1_conv1", 2 * F, 2 * F, (60, 60, 39))
    total += conv_case("decode_0_conv0", 2 * F, F, (120, 120, 78))
    print(f"k3 conv subtotal (approx, excl. transposes/1x1/DS): "
          f"{total:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
