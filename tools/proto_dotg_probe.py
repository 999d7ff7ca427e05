"""Mosaic probe: dot_general forms that would MXU-ify conv_in's MAC tail.

The entry conv's (kz,ky,kw,ci)->F contraction currently runs as 32 VPU
broadcast-MACs (~1.5 ms of the 3.98 ms stage, DESIGN 3d.1) because the
natural matmul forms all need either a trailing-dim merge (rejected by
Mosaic) or an output with F on lanes (24 -> 128 pad). The missing
primitive is a dot_general with TWO free dims on one operand:

    lhs (K, F) . rhs (K, R, L) contract ((0,),(0,)) -> (F, R, L)

F lands ABOVE the lane dim (R sublanes, L lanes) — exactly the layout a
(f, dt, h2, w2) output block wants. This probe checks, ON REAL MOSAIC:

  1. that exact form, fp32 and bf16 operands
  2. the batched fallback (broadcast lhs): (R, K, F) x (R, K, L)
  3. values vs an XLA einsum oracle

Run standalone on the TPU (claims the chip).
"""
import sys

sys.path.insert(0, "/root/repo")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, F, R, L = 32, 24, 240, 128
rng = np.random.default_rng(0)


def _mk(shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                       ).astype(dtype)


def probe(name, kernel_fn, args, out_shape, oracle):
    try:
        out = pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(*args)
        err = float(jnp.max(jnp.abs(out - oracle)) /
                    (jnp.max(jnp.abs(oracle)) + 1e-9))
        print(f"{name}: OK rel_err={err:.2e}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return False


def main():
    w = _mk((K, F))
    p = _mk((K, R, L))
    oracle = jnp.einsum("kf,krl->frl", w, p,
                        precision=jax.lax.Precision.HIGHEST)

    def k_2free(w_ref, p_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], p_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    probe("dotg (K,F)x(K,R,L)->(F,R,L) fp32", k_2free, (w, p),
          (F, R, L), oracle)

    wb = w.astype(jnp.bfloat16)
    pb = p.astype(jnp.bfloat16)
    oracle_b = jnp.einsum("kf,krl->frl", wb.astype(jnp.float32),
                          pb.astype(jnp.float32))
    probe("dotg (K,F)x(K,R,L)->(F,R,L) bf16", k_2free, (wb, pb),
          (F, R, L), oracle_b)

    # swapped free-dims side: (K, R, L) x (K, F) -> (R, L, F)
    def k_2free_sw(p_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    probe("dotg (K,R,L)x(K,F)->(R,L,F) fp32", k_2free_sw, (p, w),
          (R, L, F), jnp.einsum("krl,kf->rlf", p, w,
                                precision=jax.lax.Precision.HIGHEST))

    # batched with broadcast lhs: (R, K, F) x (R, K, L) -> (R, F, L)
    wbro = jnp.broadcast_to(w[None], (R, K, F))
    p_t = jnp.transpose(p, (1, 0, 2))  # (R, K, L)
    oracle2 = jnp.einsum("rkf,rkl->rfl", wbro, p_t,
                         precision=jax.lax.Precision.HIGHEST)

    def k_batched(w_ref, p_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], p_ref[:], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    probe("batched (R,K,F)x(R,K,L)->(R,F,L) fp32", k_batched,
          (wbro, p_t), (R, F, L), oracle2)


if __name__ == "__main__":
    main()
