"""v5 fused tower-block kernel (in-kernel depth stages, resident
spectrum — kernels/tower_block_s.py) vs the module path and the v2
kernel, interpreter mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu.kernels import tower_block as tb
from multimodal_3d_image_segmentation_tpu.kernels import tower_block_s as tbs
from multimodal_3d_image_segmentation_tpu.models.architectures import (
    NeuralOperatorBlock)

from test_tower_kernel import _block_params

# v5 is an UNROUTED engineering-record kernel (wrong values on real
# Mosaic — blocked by a hardware probe in tower_block_s; docs/ROADMAP.md):
# keep its interpret-mode regression tests out of the fast split.
pytestmark = pytest.mark.slow


@pytest.fixture
def tower_s_enabled():
    tbs.set_enabled(True)
    yield
    tbs.set_enabled(None)


def _run_fused_s(x_cl, op, w_cat, w_cc_t, b_cat, transform, modes):
    b, d, h, w, c = x_cl.shape
    spec = tbs.make_tower_spec_s(transform, (d, h, w), modes, c)
    x_flat = tb.to_tower_flat(x_cl)
    s0 = tbs.entry_spectrum_s(x_flat, spec)
    sy = tbs.spectrum_mix_s(s0, op, spec)
    out_flat, sf = tbs.fused_tower_block_s(x_flat, sy, w_cat, w_cc_t,
                                           b_cat, spec, True)
    return tb.from_tower_flat(out_flat, (d, h, w), c), sf, spec


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
@pytest.mark.parametrize("shape", [(1, 8, 6, 5, 4), (1, 7, 9, 6, 4)])
def test_fused_s_block_matches_module(transform, shape):
    """Odd D exercises the partial-last-grid-step zero padding of the
    depth matrices (planes are NOT independent in v5 — garbage planes
    must contribute exact zeros to s_f)."""
    rng = np.random.default_rng(0)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    blk, params, op, w_cat, w_cc_t, b_cat = _block_params(
        jax.random.PRNGKey(1), c, transform)
    blk = NeuralOperatorBlock(c, c, (2, 2, 2), transform)
    want = blk.apply({"params": params}, x)           # channels-last

    got_cf, _, _ = _run_fused_s(x, op, w_cat, w_cc_t, b_cat, transform,
                                (2, 2, 2))
    got = jnp.transpose(got_cf[0], (1, 2, 3, 0))[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_fused_s_chain_matches_v2(transform):
    """Two chained v5 blocks == two chained v2 blocks (the s_f handoff
    through spectrum_mix_s matches f -> block_spectrum_update -> z)."""
    rng = np.random.default_rng(7)
    shape = (1, 9, 8, 6, 4)
    c = shape[-1]
    d, h, w = shape[1:4]
    modes = (2, 2, 2)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    _, _, op, w_cat, w_cc_t, b_cat = _block_params(
        jax.random.PRNGKey(3), c, transform)

    spec2 = tb.make_tower_spec(transform, (d, h, w), modes, c)
    xf = tb.to_tower_flat(x)
    f = tb.entry_forward_hw(xf, spec2)
    x2 = xf
    for _ in range(2):
        z = tb.block_spectrum_update(f, op, spec2)
        x2, f = tb.fused_tower_block(x2, z, w_cat, w_cc_t, b_cat,
                                     spec2, True)

    spec5 = tbs.make_tower_spec_s(transform, (d, h, w), modes, c)
    s = tbs.entry_spectrum_s(xf, spec5)
    x5 = xf
    for _ in range(2):
        sy = tbs.spectrum_mix_s(s, op, spec5)
        x5, s = tbs.fused_tower_block_s(x5, sy, w_cat, w_cc_t, b_cat,
                                        spec5, True)
    np.testing.assert_allclose(np.asarray(x5), np.asarray(x2),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_fused_s_reference_matches_kernel(transform):
    """The jnp replay (backward oracle) and the v5 kernel agree on both
    outputs."""
    rng = np.random.default_rng(2)
    shape = (1, 6, 10, 7, 4)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    _, _, op, w_cat, w_cc_t, b_cat = _block_params(
        jax.random.PRNGKey(3), c, transform)
    d, h, w = shape[1:4]
    spec = tbs.make_tower_spec_s(transform, (d, h, w), (2, 3, 2), c)
    x_flat = tb.to_tower_flat(x)
    sy = tbs.spectrum_mix_s(tbs.entry_spectrum_s(x_flat, spec), op, spec)
    out_k, sf_k = tbs.fused_tower_block_s(x_flat, sy, w_cat, w_cc_t,
                                          b_cat, spec, True)
    out_r, sf_r = tbs._block_reference_s(x_flat, sy, w_cat, w_cc_t,
                                         b_cat, spec)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sf_k), np.asarray(sf_r),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
@pytest.mark.parametrize("use_resize", [True, False])
def test_model_fused_s_matches_module(monkeypatch, tower_s_enabled,
                                      transform, use_resize):
    """NeuralOperatorSeg routed through the v5 kernel == module path
    with identical params."""
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.NeuralOperatorSeg, "_use_fused_tower",
        lambda self, x: (self.use_pallas and x.shape[0] == 1
                         and self.use_block_skip))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 11, 9))
                    .astype(np.float32))
    kw = dict(use_resize=use_resize)
    ref = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                          transform, **kw)
    fused = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                            transform, use_pallas=True,
                                            **kw)
    params = ref.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    want = ref.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_model_fused_s_deep_supervision(monkeypatch, tower_s_enabled,
                                        transform):
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.NeuralOperatorSeg, "_use_fused_tower",
        lambda self, x: (self.use_pallas and x.shape[0] == 1
                         and self.use_block_skip))
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 11, 9))
                    .astype(np.float32))
    kw = dict(use_deep_supervision=True)
    ref = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                          transform, **kw)
    fused = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                            transform, use_pallas=True,
                                            **kw)
    params = ref.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    want = ref.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_model_fused_s_bf16(monkeypatch, tower_s_enabled):
    """Whole-model bf16 through the v5 kernel (the production routing
    candidate): finite + close to the module path."""
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.NeuralOperatorSeg, "_use_fused_tower",
        lambda self, x: (self.use_pallas and x.shape[0] == 1
                         and self.use_block_skip))
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 11, 9))
                    .astype(np.float32))
    ref = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                          "Hartley",
                                          compute_dtype="bfloat16")
    fused = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                            "Hartley", use_pallas=True,
                                            compute_dtype="bfloat16")
    params = ref.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    want = ref.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    assert np.all(np.isfinite(np.asarray(got, np.float32)))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.slow
@pytest.mark.parametrize("patch", [None, 2])
def test_model_fused_s_mha_matches_module(monkeypatch, tower_s_enabled,
                                          patch):
    """HartleyMHASeg through the v5 kernel (the MHA module consumes the
    resident spectrum directly, sliced to the true W extent) matches the
    module path."""
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.HartleyMHASeg, "_use_fused_tower",
        lambda self, x: self.use_pallas and x.shape[0] == 1)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 12, 10))
                    .astype(np.float32))
    kw = dict(patch_size=patch)
    ref = architectures.HartleyMHASeg(2, 3, 4, 2, 2, (2, 2, 2), **kw)
    fused = architectures.HartleyMHASeg(2, 3, 4, 2, 2, (2, 2, 2),
                                        use_pallas=True, **kw)
    params = ref.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    p2 = fused.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    want = ref.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_fused_s_train_step_bf16(monkeypatch, tower_s_enabled):
    """Gradients flow through the v5 tower at bf16 with deep
    supervision (custom VJP replay handles the resident-spectrum
    carry)."""
    from multimodal_3d_image_segmentation_tpu import losses
    from multimodal_3d_image_segmentation_tpu.models import architectures
    from multimodal_3d_image_segmentation_tpu.runtime import (
        build_optimizer, create_train_state, make_train_step)

    monkeypatch.setattr(
        architectures.NeuralOperatorSeg, "_use_fused_tower",
        lambda self, x: (self.use_pallas and x.shape[0] == 1
                         and self.use_block_skip))
    rng = np.random.default_rng(43)
    x = jnp.asarray(rng.standard_normal((1, 2, 10, 9, 8))
                    .astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (1, 1, 10, 9, 8)).astype(np.int32))
    fused = architectures.NeuralOperatorSeg(
        2, 3, 4, 2, (2, 2, 2), "Hartley", use_pallas=True,
        use_deep_supervision=True, compute_dtype="bfloat16")
    params = fused.init(jax.random.PRNGKey(0), x)["params"]
    tx = build_optimizer({"optimizer_name": "Adamax", "lr": 1e-3})
    step = make_train_step(losses.pcc_loss, num_labels=3, donate=False)
    state = create_train_state(fused, params, tx)
    state2, loss = step(state, x, y)
    assert np.isfinite(float(loss))
    for a in jax.tree_util.tree_leaves(state2.params):
        assert np.all(np.isfinite(np.asarray(a, np.float32)))
