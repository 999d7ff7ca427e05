"""Round-3 Mosaic capability probes for the tower-block kernel design.

Each probe is independent and prints PASS/FAIL — the results drive the
fused NeuralOperatorSeg block kernel layout (docs/DESIGN.md round 3):

  1. minor-2 transpose (jnp.swapaxes(x, -1, -2)) on f32
  2. batched dot_general (batch dim leading)
  3. dot_general with lhs contracting dim 0 ((K, M) x (K, N))
  4. minor-dim merge reshape (C, A, 128) -> (C, A*128)
  5. sublane-dim split reshape (C, A*128) -> (C, A, 128)  [known-good]
  6. dot after leading-collapse of a 3D ref  [known-good]
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _run(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        r = np.asarray(jax.jit(f)(*args))
        return r
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return None


def probe_transpose():
    x = np.arange(24 * 16 * 128, dtype=np.float32).reshape(24, 16, 128)

    def k(x_ref, o_ref):
        o_ref[...] = jnp.swapaxes(x_ref[...], -1, -2)

    r = _run("minor-2 transpose", k,
             jax.ShapeDtypeStruct((24, 128, 16), jnp.float32), x)
    if r is not None:
        ok = np.array_equal(r, np.swapaxes(x, -1, -2))
        print(f"{'PASS' if ok else 'WRONG'}  minor-2 transpose")


def probe_batched_dot():
    a = np.random.default_rng(0).standard_normal((8, 64, 32)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((8, 32, 48)).astype(np.float32)

    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    r = _run("batched dot_general", k,
             jax.ShapeDtypeStruct((8, 64, 48), jnp.float32), a, b)
    if r is not None:
        ok = np.allclose(r, np.einsum("bmk,bkn->bmn", a, b), atol=1e-3)
        print(f"{'PASS' if ok else 'WRONG'}  batched dot_general")


def probe_lhsT_dot():
    a = np.random.default_rng(0).standard_normal((32, 64)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((32, 48)).astype(np.float32)

    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    r = _run("(K,M)x(K,N) dot", k,
             jax.ShapeDtypeStruct((64, 48), jnp.float32), a, b)
    if r is not None:
        ok = np.allclose(r, a.T @ b, atol=1e-3)
        print(f"{'PASS' if ok else 'WRONG'}  (K,M)x(K,N) dot")


def probe_minor_merge():
    x = np.arange(24 * 16 * 128, dtype=np.float32).reshape(24, 16, 128)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(24, 16 * 128)

    r = _run("minor-merge reshape", k,
             jax.ShapeDtypeStruct((24, 16 * 128), jnp.float32), x)
    if r is not None:
        ok = np.array_equal(r, x.reshape(24, 16 * 128))
        print(f"{'PASS' if ok else 'WRONG'}  minor-merge reshape")


def probe_sublane_split():
    x = np.arange(24 * 16 * 128, dtype=np.float32).reshape(24, 16 * 128)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(24, 16, 128)

    r = _run("sublane-split reshape", k,
             jax.ShapeDtypeStruct((24, 16, 128), jnp.float32), x)
    if r is not None:
        ok = np.array_equal(r, x.reshape(24, 16, 128))
        print(f"{'PASS' if ok else 'WRONG'}  sublane-split reshape")


def probe_collapse_dot():
    x = np.random.default_rng(0).standard_normal((24, 16, 128)).astype(np.float32)
    m = np.random.default_rng(1).standard_normal((128, 56)).astype(np.float32)

    def k(x_ref, m_ref, o_ref):
        x2 = x_ref[...].reshape(24 * 16, 128)
        o_ref[...] = jnp.dot(x2, m_ref[...],
                             preferred_element_type=jnp.float32)

    r = _run("leading-collapse dot", k,
             jax.ShapeDtypeStruct((24 * 16, 56), jnp.float32), x, m)
    if r is not None:
        ok = np.allclose(r, x.reshape(-1, 128) @ m, atol=1e-2)
        print(f"{'PASS' if ok else 'WRONG'}  leading-collapse dot")


if __name__ == "__main__":
    probe_sublane_split()
    probe_collapse_dot()
    probe_transpose()
    probe_batched_dot()
    probe_lhsT_dot()
    probe_minor_merge()
