"""Mosaic capability probes for the tower-kernel v5 design (in-kernel
D-stages: the per-block f/z HBM tensors replaced by a VMEM-resident
spectrum + two small dots per grid step — docs/ROADMAP.md).

Each probe is independent and prints PASS/FAIL; run ON THE TPU:

  1. dot_general with a 3-D rhs, contraction ((1,),(0,)):
         (M, K) x (K, A, B) -> (M, A, B)
     This is the z/sf stage shape: mi (2P, KS) x s_y (KS, CKH, KWL).
  2. same with bf16 operands, fp32 accumulation.
  3. output block with a CONSTANT index map accumulated across grid
     steps (read-modify-write + where-select zero-init at step 0) —
     the s_f accumulator.
  4. per-plane dynamic single-row scratch writes inside fori_loop
     (f_scr[pl.ds(2p, 1)] = ...), then a whole-scratch dot.
  5. SMEM (P, 2, K) blocked input + dynamic scalar reads in fori_loop
     (the FMA fallback if probe 1 fails).
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, fn, *args):
    try:
        r = np.asarray(jax.jit(fn)(*args))
        return r
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}", flush=True)
        return None


def probe_dot3d(dtype, name):
    rng = np.random.default_rng(0)
    m, k, a, b = 16, 20, 672, 128
    lhs = rng.standard_normal((m, k)).astype(dtype)
    rhs = rng.standard_normal((k, a, b)).astype(dtype)

    def kern(l_ref, r_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            l_ref[...], r_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
        (m, a, b), jnp.float32))
    r = _run(name, f, lhs, rhs)
    if r is not None:
        want = np.einsum("mk,kab->mab", lhs.astype(np.float32),
                         rhs.astype(np.float32))
        ok = np.allclose(r, want, atol=1e-2, rtol=1e-2)
        print(f"{'PASS' if ok else 'WRONG'}  {name}  "
              f"maxdiff={np.abs(r - want).max():.2e}", flush=True)


def probe_accum_output():
    """grid=(4,) steps each add their block's contribution into ONE
    (K, A, B) output with a constant index map."""
    rng = np.random.default_rng(1)
    g, p, k, a, b = 4, 4, 12, 64, 128
    x = rng.standard_normal((g * p, a, b)).astype(np.float32)
    m = rng.standard_normal((k, g * p)).astype(np.float32)

    def kern(m_ref, x_ref, o_ref):
        i = pl.program_id(0)
        contrib = jax.lax.dot_general(
            m_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = jnp.where(i == 0, contrib, o_ref[...] + contrib)

    f = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((k, p), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, a, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, a, b), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, a, b), jnp.float32),
    )
    r = _run("grid-accumulated constant output", f, m, x)
    if r is not None:
        want = np.einsum("kd,dab->kab", m, x)
        ok = np.allclose(r, want, atol=1e-2, rtol=1e-3)
        print(f"{'PASS' if ok else 'WRONG'}  grid-accumulated constant "
              f"output  maxdiff={np.abs(r - want).max():.2e}", flush=True)


def probe_scratch_rows_then_dot():
    """fori_loop writes one (1, A, B) scratch row per plane via pl.ds,
    then one dot consumes the whole scratch."""
    rng = np.random.default_rng(2)
    p2, a, b, k = 8, 64, 128, 12
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

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, a, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p2, a, b), jnp.float32)],
    )
    r = _run("scratch row writes + dot", f, m, x)
    if r is not None:
        want = np.einsum("kd,dab->kab", m, 2.0 * x)
        ok = np.allclose(r, want, atol=1e-2, rtol=1e-3)
        print(f"{'PASS' if ok else 'WRONG'}  scratch row writes + dot  "
              f"maxdiff={np.abs(r - want).max():.2e}", flush=True)


def probe_smem_scalars():
    """SMEM (P, 2, K) block + dynamic scalar reads inside fori_loop
    broadcast onto a vector (the FMA fallback)."""
    rng = np.random.default_rng(3)
    p, k, a, b = 4, 5, 8, 128
    s = rng.standard_normal((k, a, b)).astype(np.float32)
    m = rng.standard_normal((p, 2, k)).astype(np.float32)

    def kern(m_ref, s_ref, o_ref):
        def body(pi, carry):
            acc = jnp.zeros((a, b), jnp.float32)
            for ki in range(k):
                acc = acc + s_ref[ki] * m_ref[pi, 0, ki]
            o_ref[pi] = acc
            return carry
        jax.lax.fori_loop(0, p, body, 0)

    f = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((p, a, b), jnp.float32),
    )
    r = _run("SMEM dynamic scalar FMA", f, m, s)
    if r is not None:
        want = np.einsum("pk,kab->pab", m[:, 0], s)
        ok = np.allclose(r, want, atol=1e-3, rtol=1e-3)
        print(f"{'PASS' if ok else 'WRONG'}  SMEM dynamic scalar FMA  "
              f"maxdiff={np.abs(r - want).max():.2e}", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    probe_dot3d(np.float32, "dot_general 3-D rhs f32")
    probe_dot3d(jnp.bfloat16, "dot_general 3-D rhs bf16")
    probe_accum_output()
    probe_scratch_rows_then_dot()
    probe_smem_scalars()
