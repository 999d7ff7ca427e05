"""GroupNorm(1)+ELU formulation shootout at V-Net-DS L0 shapes.

nn.GroupNorm costs ~5.2 ms at (120,120,78,24) — ~3x over the memory
bound. Candidates: one-pass moments (sum + sumsq fused by XLA into one
read), then a single normalize+ELU pass.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from multimodal_3d_image_segmentation_tpu.utils.profiling import timed_loop_ms

rng = np.random.default_rng(0)


def main():
    for shape in [(1, 120, 120, 78, 24), (1, 120, 120, 78, 48),
                  (1, 60, 60, 39, 48)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        c = shape[-1]
        gamma = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

        gn = nn.GroupNorm(num_groups=1, epsilon=1e-5)
        gp = {"params": {"scale": gamma, "bias": beta}}

        def flax_gn(v):
            return nn.elu(gn.apply(gp, v))

        def manual(v):
            n = v[0].size
            s = jnp.sum(v, dtype=jnp.float32)
            s2 = jnp.sum(jax.lax.square(v), dtype=jnp.float32)
            m = s / n
            var = s2 / n - m * m
            inv = jax.lax.rsqrt(var + 1e-5)
            return nn.elu((v - m) * (inv * gamma) + beta)

        def manual_flat(v):
            vf = v.reshape(-1)
            n = vf.size
            s = jnp.sum(vf, dtype=jnp.float32)
            s2 = jnp.sum(jax.lax.square(vf), dtype=jnp.float32)
            m = s / n
            inv = jax.lax.rsqrt(s2 / n - m * m + 1e-5)
            return nn.elu((v - m) * inv * gamma + beta)

        ref = flax_gn(x)
        for name, fn in [("flax GN+elu", flax_gn), ("manual", manual),
                         ("manual_flat", manual_flat)]:
            err = float(jnp.max(jnp.abs(fn(x) - ref)))
            ms = timed_loop_ms(fn, x, n_short=1, n_long=7, repeats=3)
            print(f"{shape} {name:12s} {ms:6.2f} ms   maxdiff {err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
