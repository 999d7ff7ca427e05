"""Fused tower-block kernel vs the module-path NeuralOperatorBlock
(interpreter mode on CPU). Covers Hartley + Fourier, fp32 + bf16, odd
sizes, gradients, and the entry/exit layout helpers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu.kernels import tower_block as tb
from multimodal_3d_image_segmentation_tpu.models.architectures import (
    NeuralOperatorBlock)


def _block_params(key, c, transform):
    """Init the module block and extract kernel-side weight bundles."""
    x = jnp.zeros((1, 8, 6, 5, c))
    blk = NeuralOperatorBlock(c, c, (2, 2, 2), transform)
    params = blk.init(key, x)["params"]
    mat_conv = params["conv_branch"]["kernel"].reshape(c, c)
    mat_cc = params["conv_concat"]["conv"]["kernel"].reshape(2 * c, c)
    b_cc = params["conv_concat"]["conv"]["bias"]
    if transform == "Hartley":
        op = (params["op"]["weight"],)
    else:
        op = (params["op"]["weight_real"], params["op"]["weight_imag"])
    w_cat = jnp.concatenate([mat_conv.T, mat_cc[c:].T], axis=0)
    w_cc_t = mat_cc[:c].T
    b_cat = jnp.concatenate([jnp.zeros_like(b_cc), b_cc])
    return blk, params, op, w_cat, w_cc_t, b_cat


def _run_fused(x_cl, op, w_cat, w_cc_t, b_cat, transform, modes):
    b, d, h, w, c = x_cl.shape
    spec = tb.make_tower_spec(transform, (d, h, w), modes, c)
    x_flat = tb.to_tower_flat(x_cl)
    f = tb.entry_forward_hw(x_flat, spec)
    z = tb.block_spectrum_update(f, op, spec)
    out_flat, f_next = tb.fused_tower_block(x_flat, z, w_cat, w_cc_t,
                                            b_cat, spec, True)
    return tb.from_tower_flat(out_flat, (d, h, w), c), f_next, spec


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
@pytest.mark.parametrize("shape", [(1, 8, 6, 5, 4), (1, 7, 9, 6, 4)])
def test_fused_block_matches_module(transform, shape):
    rng = np.random.default_rng(0)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    blk, params, op, w_cat, w_cc_t, b_cat = _block_params(
        jax.random.PRNGKey(1), c, transform)
    blk = NeuralOperatorBlock(c, c, (2, 2, 2), transform)
    want = blk.apply({"params": params}, x)           # channels-last

    got_cf, _, _ = _run_fused(x, op, w_cat, w_cc_t, b_cat, transform,
                              (2, 2, 2))
    got = jnp.transpose(got_cf[0], (1, 2, 3, 0))[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_fused_block_reference_matches_kernel(transform):
    """The jnp reference replay (used for the backward pass) and the
    Pallas kernel agree."""
    rng = np.random.default_rng(2)
    shape = (1, 6, 10, 7, 4)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    _, _, op, w_cat, w_cc_t, b_cat = _block_params(
        jax.random.PRNGKey(3), c, transform)
    d, h, w = shape[1:4]
    spec = tb.make_tower_spec(transform, (d, h, w), (2, 3, 2), c)
    x_flat = tb.to_tower_flat(x)
    f = tb.entry_forward_hw(x_flat, spec)
    z = tb.block_spectrum_update(f, op, spec)
    out_k, f_k = tb.fused_tower_block(x_flat, z, w_cat, w_cc_t, b_cat,
                                      spec, True)
    out_r, f_r = tb._block_reference(x_flat, z, w_cat, w_cc_t, b_cat,
                                     spec)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r),
                               atol=1e-4, rtol=1e-4)


def test_fused_block_bf16_close():
    rng = np.random.default_rng(4)
    shape = (1, 6, 8, 5, 4)
    c = shape[-1]
    x32 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    blk, params, op, w_cat, w_cc_t, b_cat = _block_params(
        jax.random.PRNGKey(5), c, "Hartley")
    want = blk.apply({"params": params}, x32)
    got_cf, _, _ = _run_fused(x32.astype(jnp.bfloat16), op, w_cat,
                              w_cc_t, b_cat, "Hartley", (2, 2, 2))
    got = jnp.transpose(got_cf[0].astype(jnp.float32), (1, 2, 3, 0))[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)


def test_fused_block_grad_flows():
    rng = np.random.default_rng(6)
    shape = (1, 6, 6, 5, 4)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    _, _, op, w_cat, w_cc_t, b_cat = _block_params(
        jax.random.PRNGKey(7), c, "Hartley")
    d, h, w = shape[1:4]
    spec = tb.make_tower_spec("Hartley", (d, h, w), (2, 2, 2), c)
    x_flat = tb.to_tower_flat(x)
    f = tb.entry_forward_hw(x_flat, spec)

    def loss(w_cat, w_cc_t, b_cat, x_flat):
        z = tb.block_spectrum_update(f, op, spec)
        out, _ = tb.fused_tower_block(x_flat, z, w_cat, w_cc_t, b_cat,
                                      spec, True)
        return jnp.sum(jnp.sin(out))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(w_cat, w_cc_t, b_cat,
                                                 x_flat)
    # finite + matches the pure-jnp formulation's gradient
    def loss_ref(w_cat, w_cc_t, b_cat, x_flat):
        z = tb.block_spectrum_update(f, op, spec)
        out, _ = tb._block_reference(x_flat, z, w_cat, w_cc_t, b_cat,
                                     spec)
        return jnp.sum(jnp.sin(out))

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        w_cat, w_cc_t, b_cat, x_flat)
    for g, gr in zip(grads, grads_ref):
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   atol=5e-3, rtol=5e-3)


def test_layout_roundtrip():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 5, 7, 6, 3)).astype(np.float32))
    flat = tb.to_tower_flat(x)
    back = tb.from_tower_flat(flat, (5, 7, 6), 3)   # (1, C, D, H, W)
    want = jnp.transpose(x[0], (3, 0, 1, 2))[None]
    np.testing.assert_allclose(np.asarray(back), np.asarray(want))


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
@pytest.mark.parametrize("use_resize", [True, False])
def test_model_fused_path_matches_module(monkeypatch, transform,
                                         use_resize):
    """NeuralOperatorSeg(use_pallas=True) == module path with identical
    params (TPU gate bypassed; kernels run in interpret mode)."""
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
    # identical parameter trees (checkpoints interchangeable)
    p2 = fused.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    want = ref.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_model_fused_path_bf16(monkeypatch, transform):
    """Whole-model bf16 fused path traces + runs (regression: the scan
    carried a bf16 entry spectrum against the kernel's fp32 f output —
    TypeError at trace time, seen only on the real-TPU routing gate)."""
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.NeuralOperatorSeg, "_use_fused_tower",
        lambda self, x: (self.use_pallas and x.shape[0] == 1
                         and self.use_block_skip))
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 11, 9))
                    .astype(np.float32))
    ref = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                          transform,
                                          compute_dtype="bfloat16")
    fused = architectures.NeuralOperatorSeg(2, 3, 4, 3, (2, 2, 2),
                                            transform, use_pallas=True,
                                            compute_dtype="bfloat16")
    params = ref.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    want = ref.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    assert np.all(np.isfinite(np.asarray(got, np.float32)))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("transform", ["Hartley", "Fourier"])
def test_model_fused_deep_supervision_matches_module(monkeypatch,
                                                     transform):
    """use_deep_supervision rides the kernel's packed dot (extra w_cat
    rows) + scan-carried accumulator; values match the module path."""
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
    p2 = fused.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    want = ref.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "patch", [pytest.param(None, marks=pytest.mark.slow), 2])
def test_model_fused_mha_matches_module(monkeypatch, patch):
    """HartleyMHASeg(use_pallas=True): the shared fused kernel + the real
    MHA module as the spectrum update matches the module path."""
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


def test_fused_tower_train_step(monkeypatch):
    """A real train step (value_and_grad + Adamax) through the fused
    tower (scan + custom VJP): loss matches the module path and grads
    are finite."""
    from multimodal_3d_image_segmentation_tpu import losses
    from multimodal_3d_image_segmentation_tpu.models import architectures
    from multimodal_3d_image_segmentation_tpu.runtime import (
        build_optimizer, create_train_state, make_train_step)

    monkeypatch.setattr(
        architectures.NeuralOperatorSeg, "_use_fused_tower",
        lambda self, x: (self.use_pallas and x.shape[0] == 1
                         and self.use_block_skip))
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal((1, 2, 10, 9, 8))
                    .astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (1, 1, 10, 9, 8)).astype(np.int32))
    ref = architectures.NeuralOperatorSeg(2, 3, 4, 2, (2, 2, 2), "Hartley")
    fused = architectures.NeuralOperatorSeg(2, 3, 4, 2, (2, 2, 2),
                                            "Hartley", use_pallas=True)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    tx = build_optimizer({"optimizer_name": "Adamax", "lr": 1e-3})
    step = make_train_step(losses.pcc_loss, num_labels=3, donate=False)

    s_ref = create_train_state(ref, params, tx)
    s_fused = create_train_state(fused, params, tx)
    s_ref2, loss_ref = step(s_ref, x, y)
    s_fused2, loss_fused = step(s_fused, x, y)
    np.testing.assert_allclose(float(loss_fused), float(loss_ref),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_fused2.params),
                    jax.tree_util.tree_leaves(s_ref2.params)):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-2)


def test_mha_fused_gate_honors_highest(monkeypatch):
    """HartleyMHASeg serves the module path when fp32 HIGHEST exactness
    is requested (the fused kernel's dots are bf16x3 'high'-class)."""
    from multimodal_3d_image_segmentation_tpu.models import architectures
    from multimodal_3d_image_segmentation_tpu.ops import spectral

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    m = architectures.HartleyMHASeg(2, 3, 4, 2, 2, (2, 2, 2),
                                    use_pallas=True)
    x = jnp.zeros((1, 2, 12, 12, 10), jnp.float32)
    monkeypatch.setattr(spectral, "PRECISION", jax.lax.Precision.HIGHEST)
    assert not m._use_fused_tower(x)
    monkeypatch.setattr(spectral, "PRECISION", jax.lax.Precision.HIGH)
    assert m._use_fused_tower(x)
    # bf16 serves the module path since the round-4 zoo re-check
    # (26.73 ms module vs 39.72 fused) unless the fused A/B opt-in is on
    monkeypatch.setattr(spectral, "PRECISION", jax.lax.Precision.HIGHEST)
    mb = architectures.HartleyMHASeg(2, 3, 4, 2, 2, (2, 2, 2),
                                     use_pallas=True,
                                     compute_dtype="bfloat16")
    assert not mb._use_fused_tower(x)
    architectures.set_fused_tower(True)
    try:
        assert mb._use_fused_tower(x)
    finally:
        architectures.set_fused_tower(None)


def test_fused_tower_train_step_bf16(monkeypatch):
    """Gradients flow through the fused tower at bf16 — the production
    routing (the fused path is gated to bfloat16 on TPU). Regression:
    the custom-VJP replay emitted bf16 f/ds cotangent shapes against the
    kernel's fp32 outputs, so every bf16 train step crashed in vjp."""
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


def test_tower_s_hw_guard_refuses_failing_backend(monkeypatch):
    """The v5 kernel must REFUSE to run non-interpret on a backend where
    its scratch-row-write-then-dot pattern computes wrong values
    (real Mosaic today — docs/ROADMAP.md). On CPU the non-interpret
    pallas_call probe fails outright, so the guard must raise rather
    than silently produce wrong segmentations."""
    from multimodal_3d_image_segmentation_tpu.kernels import (
        tower_block_s as tbs)

    monkeypatch.setattr(tbs, "_HW_PROBE_OK", None)  # force a re-probe
    spec = tbs.make_tower_spec_s("Hartley", (6, 8, 8), (2, 2, 2), 4)
    d, c = spec.sizes[0], spec.channels
    npl = spec.sizes[2] * spec.hl
    x = jnp.zeros((d, c, npl), jnp.float32)
    sy = jnp.zeros((spec.kd, 2 * c * spec.kh, spec.kwl), jnp.float32)
    w_cat = jnp.zeros((2 * c, c), jnp.float32)
    w_cc = jnp.zeros((c, c), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    with pytest.raises(RuntimeError, match="blocked on this backend"):
        tbs.fused_tower_block_s(x, sy, w_cat, w_cc, b, spec,
                                False)  # interpret=False
    assert tbs._HW_PROBE_OK is False  # cached verdict
