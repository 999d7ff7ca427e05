"""VMEM-resident whole-tower kernel (``kernels/tower_resident.py``).

Oracle: the pure-jnp reference chain (identical math to the module
path's per-block scan) in fp32 — the kernel keeps the folded spectrum
in fp32 scratch, so it must sit *between* the bf16 module chain and the
fp32 oracle in accuracy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_3d_image_segmentation_tpu.kernels import tower_block as tb
from multimodal_3d_image_segmentation_tpu.kernels import tower_resident as tr

# tower_resident is an UNROUTED engineering-record kernel (measured dead
# end, docs/DESIGN.md §8b): keep its regression tests out of the fast
# split — no user-reachable path exercises this code.
pytestmark = pytest.mark.slow


def _inputs(transform, sizes=(9, 18, 10), modes=(3, 4, 4), c=8, nb=3,
            seed=0):
    spec = tb.make_tower_spec(transform, sizes, modes, c)
    d = spec.sizes[0]
    npl = spec.sizes[2] * spec.hl
    pr = 1 if transform == "Hartley" else 2
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32))
    return (spec, r(d, c, npl) * 0.3, r(nb, pr, c, c) * 0.2,
            r(nb, 2 * c, c) * 0.2, r(nb, c, c) * 0.2, r(nb, 2 * c) * 0.1)


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_resident_close_to_fp32_oracle(transform):
    spec, xf, ops, wc, wt, b = _inputs(transform)
    out = np.asarray(tr.resident_tower(
        xf.astype(jnp.bfloat16), ops, wc, wt, b, spec, True), np.float32)
    ref32 = np.asarray(tr._reference_chain(xf, ops, wc, wt, b, spec),
                       np.float32)
    scale = np.max(np.abs(ref32)) + 1e-9
    assert np.max(np.abs(out - ref32)) / scale < 0.02


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_resident_beats_bf16_chain(transform):
    """fp32 spectrum scratch should make the kernel at least as close
    to the fp32 oracle as the all-bf16 reference chain is."""
    spec, xf, ops, wc, wt, b = _inputs(transform, seed=3)
    x16 = xf.astype(jnp.bfloat16)
    out = np.asarray(tr.resident_tower(x16, ops, wc, wt, b, spec, True),
                     np.float32)
    ref32 = np.asarray(tr._reference_chain(xf, ops, wc, wt, b, spec),
                       np.float32)
    ref16 = np.asarray(tr._reference_chain(
        x16, ops.astype(jnp.bfloat16), wc.astype(jnp.bfloat16),
        wt.astype(jnp.bfloat16), b.astype(jnp.bfloat16), spec),
        np.float32)
    kerr = np.max(np.abs(out - ref32))
    cerr = np.max(np.abs(ref16 - ref32))
    assert kerr <= cerr * 1.5  # same class; typically ~2x better


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_resident_odd_sizes_single_block(transform):
    spec, xf, ops, wc, wt, b = _inputs(transform, sizes=(5, 11, 7),
                                       modes=(2, 3, 3), c=4, nb=1)
    out = np.asarray(tr.resident_tower(
        xf.astype(jnp.bfloat16), ops, wc, wt, b, spec, True), np.float32)
    ref32 = np.asarray(tr._reference_chain(xf, ops, wc, wt, b, spec),
                       np.float32)
    scale = np.max(np.abs(ref32)) + 1e-9
    assert np.max(np.abs(out - ref32)) / scale < 0.02


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_resident_grad_matches_reference(transform):
    spec, xf, ops, wc, wt, b = _inputs(transform)
    x16 = xf.astype(jnp.bfloat16)

    def loss_k(*a):
        return jnp.mean(
            tr.resident_tower(*a, spec, True).astype(jnp.float32) ** 2)

    def loss_r(*a):
        return jnp.mean(
            tr._reference_chain(*a, spec=spec).astype(jnp.float32) ** 2)

    gk = jax.grad(loss_k, argnums=(1, 2, 3, 4))(x16, ops, wc, wt, b)
    gr = jax.grad(loss_r, argnums=(1, 2, 3, 4))(
        x16.astype(jnp.float32), ops, wc, wt, b)
    for a, r in zip(gk, gr):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        assert np.all(np.isfinite(a))
        scale = np.max(np.abs(r)) + 1e-9
        assert np.max(np.abs(a - r)) / scale < 0.1


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_model_resident_path_matches_module(monkeypatch, transform):
    from multimodal_3d_image_segmentation_tpu.models import architectures
    monkeypatch.setattr(
        architectures.NeuralOperatorSeg, "_use_fused_tower",
        lambda self, x: (self.use_pallas and self.ndim == 5
                         and self.channel_first_io and x.shape[0] == 1
                         and self.weights_type == "shared"))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 17, 18, 11))
                    .astype(np.float32))
    kw = dict(use_resize=True, compute_dtype="bfloat16")
    fused = architectures.NeuralOperatorSeg(
        2, 3, 8, 3, (2, 3, 3), transform, use_pallas=True, **kw)
    module = architectures.NeuralOperatorSeg(
        2, 3, 8, 3, (2, 3, 3), transform, use_pallas=False, **kw)
    params = fused.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    # identical param trees: checkpoints interchangeable
    p2 = module.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    yf = np.asarray(fused.apply({"params": params}, x), np.float32)
    ym = np.asarray(module.apply({"params": params}, x), np.float32)
    assert 0 < np.max(np.abs(yf - ym)) < 0.05  # bf16-class, path taken
