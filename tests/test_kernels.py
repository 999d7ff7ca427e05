"""Pallas kernel tests (interpreter mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.kernels import fused_freq_chain


def _reference_chain(x, weights):
    for w in weights:
        x = jax.nn.selu(jnp.einsum("...i,oi->...o", x, w) + x)
    return x


def test_fused_freq_chain_matches_einsum_chain():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 4, 24)).astype(np.float32))
    weights = [jnp.asarray(rng.standard_normal((24, 24)).astype(np.float32)
                           * 0.2) for _ in range(3)]
    want = np.asarray(_reference_chain(x, weights))
    got = np.asarray(fused_freq_chain(x, weights, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_freq_chain_empty_is_identity():
    """A 0-conv chain is the identity, like the module path's 0-iteration
    loop (regression: jnp.stack([]) raised at trace time)."""
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((1, 4, 4, 2, 8)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(fused_freq_chain(x, [], interpret=True)), np.asarray(x))


def test_fused_freq_chain_row_padding():
    """Row count not divisible by the tile size."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 5, 7, 3, 16)).astype(np.float32))
    weights = [jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32)
                           * 0.2)]
    want = np.asarray(_reference_chain(x, weights))
    got = np.asarray(fused_freq_chain(x, weights, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hnosegxs_pallas_path_matches_module_path():
    """use_pallas=True produces the same params tree and the same outputs
    as the module path."""
    kw = dict(in_channels=2, out_channels=3, filters=8,
              num_transform_blocks=[2, 2], num_modes=(3, 4, 4))
    m_ref = models.HNOSegXS(**kw, use_pallas=False)
    m_pal = models.HNOSegXS(**kw, use_pallas=True)

    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 2, 16, 16, 12)).astype(np.float32))
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    p_pal = m_pal.init(jax.random.PRNGKey(0), x)["params"]

    # identical parameter structure (checkpoints interchangeable)
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_pal))

    y_ref = np.asarray(m_ref.apply({"params": p_ref}, x))
    y_pal = np.asarray(m_pal.apply({"params": p_ref}, x))
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-5)


def test_fused_freq_chain_gradients_match():
    """Custom VJP of the kernel == autodiff of the einsum chain."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 4, 16)).astype(np.float32))
    weights = [jnp.asarray((rng.standard_normal((16, 16)) * 0.2)
                           .astype(np.float32)) for _ in range(3)]

    def loss_ref(x, ws):
        return jnp.sum(jnp.sin(_reference_chain(x, ws)))

    def loss_pal(x, ws):
        return jnp.sum(jnp.sin(fused_freq_chain(x, ws, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(x, weights)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               atol=1e-4)
    for a, b in zip(g_pal[1], g_ref[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_conv_in_kernel_matches_and_differentiates():
    from multimodal_3d_image_segmentation_tpu.kernels.conv_in import (
        conv_in_s2d, _reference_xla)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 3, 18, 14, 11)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((2, 2, 2, 3, 8)) * .2)
                    .astype(np.float32))
    b = jnp.asarray((rng.standard_normal(8) * .05).astype(np.float32))

    want = np.asarray(_reference_xla(x, k, b))
    got = np.asarray(conv_in_s2d(x, k, b, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss_pal(x, k, b):
        return jnp.sum(jnp.sin(conv_in_s2d(x, k, b, interpret=True)))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(_reference_xla(x, k, b)))

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, k, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)


@pytest.mark.slow
def test_vnetds_conv_in_kernel_matches_module_path(monkeypatch):
    """VNetDS use_pallas conv_in: same param tree and same outputs as the
    ConvNormAct path (kernel runs in interpret mode off-TPU; the TPU gate
    is bypassed for the test)."""
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.VNetDS, "_use_conv_in_kernel",
        lambda self, x_cf: (self.use_pallas and self.use_resize
                            and self.ndim == 5 and self.channel_first_io
                            and x_cf.shape[0] == 1))

    kw = dict(in_channels=2, out_channels=3, base_num_filters=8,
              num_blocks=[1, 2], right_leg_indexes=[0, 1])
    m_ref = models.VNetDS(**kw)
    m_pal = models.VNetDS(**kw, use_pallas=True)

    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 2, 16, 16, 12)).astype(np.float32))
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    p_pal = m_pal.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_pal))

    y_ref = np.asarray(m_ref.apply({"params": p_ref}, x))
    y_pal = np.asarray(m_pal.apply({"params": p_ref}, x))
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-5)

    # selu/SNN variant fuses the activation in-kernel
    kws = dict(kw, activation="selu", use_snn=True)
    m_ref_s = models.VNetDS(**kws)
    m_pal_s = models.VNetDS(**kws, use_pallas=True)
    p_s = m_ref_s.init(jax.random.PRNGKey(1), x)["params"]
    p_s2 = m_pal_s.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(p_s)
            == jax.tree_util.tree_structure(p_s2))
    np.testing.assert_allclose(
        np.asarray(m_pal_s.apply({"params": p_s}, x)),
        np.asarray(m_ref_s.apply({"params": p_s}, x)), atol=1e-5)


def test_hnosegxs_flat_path_matches_module_path(monkeypatch):
    """Flat-layout (Dp, C, Npl) execution: same param tree, same outputs
    as the module path (TPU gate bypassed; kernels run in interpret)."""
    from multimodal_3d_image_segmentation_tpu.models import hnosegxs

    monkeypatch.setattr(
        hnosegxs.HNOSegXS, "_use_flat_blocks",
        lambda self, x_cf: (self.use_flat and self.ndim == 5
                            and self.channel_first_io
                            and x_cf.shape[0] == 1
                            and self.weights_type == "shared"
                            and self.use_block_concat))

    for kw in [
        dict(in_channels=2, out_channels=3, filters=8,
             num_transform_blocks=[2, 2], num_modes=(3, 4, 4)),
        dict(in_channels=2, out_channels=3, filters=8,
             num_transform_blocks=[1, 1, 1], num_modes=(3, 4, 4),
             use_deep_supervision=True),
        dict(in_channels=2, out_channels=3, filters=8,
             num_transform_blocks=[2], num_modes=(3, 4, 4),
             use_resize=False),
    ]:
        m_ref = models.HNOSegXS(**kw, use_pallas=False)
        m_flat = models.HNOSegXS(**kw, use_flat=True)
        x = jnp.asarray(np.random.default_rng(5).standard_normal(
            (1, 2, 16, 16, 12)).astype(np.float32))
        p_ref = m_ref.init(jax.random.PRNGKey(0), x)["params"]
        p_flat = m_flat.init(jax.random.PRNGKey(0), x)["params"]
        assert (jax.tree_util.tree_structure(p_ref)
                == jax.tree_util.tree_structure(p_flat)), kw
        y_ref = np.asarray(m_ref.apply({"params": p_ref}, x))
        y_flat = np.asarray(m_flat.apply({"params": p_ref}, x))
        np.testing.assert_allclose(y_flat, y_ref, atol=2e-5, err_msg=str(kw))


@pytest.mark.slow
def test_vnetds_flat_path_matches_module_path(monkeypatch):
    """V-Net-DS flat-layout execution: same param tree, same outputs as
    the channels-last module path (TPU gate bypassed; kernels interpret)."""
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.VNetDS, "_use_flat",
        lambda self, x_cf: (self.use_pallas and self.ndim == 5
                            and self.channel_first_io
                            and x_cf.shape[0] == 1))

    for kw in [
        dict(in_channels=2, out_channels=3, base_num_filters=4,
             num_blocks=[1, 2, 2], right_leg_indexes=[0, 1, 2]),
        dict(in_channels=2, out_channels=3, base_num_filters=4,
             num_blocks=[1, 2], right_leg_indexes=[0],
             activation="selu", use_snn=True),
        dict(in_channels=2, out_channels=3, base_num_filters=4,
             num_blocks=[1, 1], use_residual=False, use_resize=False),
        # degenerate 0-block section: the residual 1x1 has no chain conv
        # to ride, so the flat path falls back to an XLA tap
        dict(in_channels=2, out_channels=3, base_num_filters=4,
             num_blocks=[0], right_leg_indexes=[0]),
    ]:
        m_ref = models.VNetDS(**kw)
        m_flat = models.VNetDS(**kw, use_pallas=True)
        x = jnp.asarray(np.random.default_rng(7).standard_normal(
            (1, 2, 16, 16, 12)).astype(np.float32))
        p_ref = m_ref.init(jax.random.PRNGKey(0), x)["params"]
        p_flat = m_flat.init(jax.random.PRNGKey(0), x)["params"]
        assert (jax.tree_util.tree_structure(p_ref)
                == jax.tree_util.tree_structure(p_flat)), kw
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_flat)):
            assert a.shape == b.shape
        y_ref = np.asarray(m_ref.apply({"params": p_ref}, x))
        y_flat = np.asarray(m_flat.apply({"params": p_ref}, x))
        np.testing.assert_allclose(y_flat, y_ref, atol=3e-5, err_msg=str(kw))


def test_conv3_flat_gradients_match_xla():
    """Custom VJP of the flat conv kernel == autodiff of the XLA
    formulation (both interpret-mode here)."""
    from multimodal_3d_image_segmentation_tpu.kernels.conv3d_flat import (
        conv3_flat, flat_geom, to_flat, _conv3_xla_reference)
    rng = np.random.default_rng(11)
    g = flat_geom(5, 8, 10)
    x = to_flat(jnp.asarray(rng.standard_normal((8, 5, 8, 10)),
                            jnp.float32), g)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)

    def loss_k(xf, kk, bb):
        return jnp.sum(conv3_flat(xf, kk, bb, g) ** 2)

    def loss_r(xf, kk, bb):
        return jnp.sum(_conv3_xla_reference(xf, kk, bb, None, g, None) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=1e-3)

    # prologue-fused variant also differentiates (incl. wrt scale/shift)
    scale = jnp.asarray(rng.standard_normal(8) * 0.1 + 1, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)

    def loss_p(xf, sc, sh):
        return jnp.sum(conv3_flat(xf, k, b, g, prologue=(sc, sh),
                                  prologue_act="elu") ** 2)

    gs = jax.grad(loss_p, argnums=(1, 2))(x, scale, shift)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in gs)


def test_conv3_flat_dilated_prologue_matches_xla():
    """dilated_depth (transposed-conv input dilation) parity + gradients,
    with and without a fused prologue. Regression: the backward reference
    used to apply the prologue AFTER dilation, turning the structurally
    inserted zero planes into act(shift) — a different function than the
    kernel's forward (which zeroes them after its prologue)."""
    from multimodal_3d_image_segmentation_tpu.kernels.conv3d_flat import (
        apply_affine_act_flat, conv3_flat, flat_geom, to_flat,
        _conv3_xla_reference, _dilate_d_flat)
    rng = np.random.default_rng(17)
    d_src, h, w, c, co = 4, 6, 7, 5, 4
    g_src = flat_geom(d_src, h, w)
    g_out = flat_geom(2 * d_src, h, w)
    x = to_flat(jnp.asarray(rng.standard_normal((c, d_src, h, w)),
                            jnp.float32), g_src)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, co)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(c) * 0.5, jnp.float32)

    def want_fn(xf, kk, bb, sc, sh):
        xr = xf if sc is None else apply_affine_act_flat(xf, sc, sh, "elu")
        return _conv3_xla_reference(_dilate_d_flat(xr, d_src), kk, bb,
                                    None, g_out, None)

    # no-prologue forward parity
    got = conv3_flat(x, k, b, g_out, dilated_depth=d_src)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_fn(x, k, b, None, None)),
        atol=5e-4, rtol=1e-3)

    # prologue + dilation forward parity (nonzero shift is the case that
    # exposed the ordering bug)
    got_p = conv3_flat(x, k, b, g_out, prologue=(scale, shift),
                       prologue_act="elu", dilated_depth=d_src)
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(want_fn(x, k, b, scale, shift)),
        atol=5e-4, rtol=1e-3)

    # gradients of the kernel == autodiff of the correctly ordered
    # reference, incl. wrt the prologue params
    def loss_k(xf, kk, bb, sc, sh):
        return jnp.sum(conv3_flat(xf, kk, bb, g_out,
                                  prologue=(sc, sh), prologue_act="elu",
                                  dilated_depth=d_src) ** 2)

    def loss_r(xf, kk, bb, sc, sh):
        return jnp.sum(want_fn(xf, kk, bb, sc, sh) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, k, b, scale, shift)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, k, b, scale, shift)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_vnetds_flat_trains(monkeypatch):
    """One optimization step through the flat path decreases the loss
    (gradients flow through kernels via the custom VJPs)."""
    from multimodal_3d_image_segmentation_tpu.models import architectures
    from multimodal_3d_image_segmentation_tpu import losses
    import optax

    monkeypatch.setattr(
        architectures.VNetDS, "_use_flat",
        lambda self, x_cf: self.use_pallas and x_cf.shape[0] == 1)

    m = models.VNetDS(2, 3, 4, [1, 1], right_leg_indexes=[0, 1],
                      use_pallas=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 12, 8)), jnp.float32)
    y = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 3, (1, 12, 12, 8))), 3).transpose(
        (0, 4, 1, 2, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def loss_fn(p):
        return losses.pcc_loss(m.apply({"params": p}, x), y)

    l0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    updates, opt = tx.update(grads, opt, params)
    params2 = optax.apply_updates(params, updates)
    l1 = loss_fn(params2)
    assert float(l1) < float(l0)


def test_vnetds_flat_bf16(monkeypatch):
    """Flat path with bf16 activations: runs, returns finite fp32-in
    dtype output, and stays close to the fp32 flat path."""
    from multimodal_3d_image_segmentation_tpu.models import architectures

    monkeypatch.setattr(
        architectures.VNetDS, "_use_flat",
        lambda self, x_cf: self.use_pallas and x_cf.shape[0] == 1)

    kw = dict(in_channels=2, out_channels=3, base_num_filters=4,
              num_blocks=[1, 1], right_leg_indexes=[0, 1])
    m32 = models.VNetDS(**kw, use_pallas=True)
    m16 = models.VNetDS(**kw, use_pallas=True, compute_dtype="bfloat16")
    x = jnp.asarray(np.random.default_rng(9).standard_normal(
        (1, 2, 12, 12, 8)).astype(np.float32))
    p = m32.init(jax.random.PRNGKey(0), x)["params"]
    y32 = np.asarray(m32.apply({"params": p}, x))
    y16 = np.asarray(m16.apply({"params": p}, x))
    assert y16.dtype == np.float32  # cast back to the input dtype
    assert np.all(np.isfinite(y16))
    np.testing.assert_allclose(y16, y32, atol=0.05)  # softmax outputs


def test_conv3_flat_emit_stats_matches_xla():
    """Kernel-emitted GroupNorm moment sums == XLA sums over the clean-
    bordered output; gradients flow through the stats output."""
    from multimodal_3d_image_segmentation_tpu.kernels.conv3d_flat import (
        conv3_flat, flat_geom, to_flat, _conv3_xla_reference)
    rng = np.random.default_rng(13)
    g = flat_geom(5, 8, 10)
    x = to_flat(jnp.asarray(rng.standard_normal((8, 5, 8, 10)),
                            jnp.float32), g)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 6)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)

    y, stats = conv3_flat(x, k, b, g, emit_stats=True)
    y_ref, stats_ref = _conv3_xla_reference(x, k, b, None, g, None,
                                            emit_stats=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
    assert stats.shape == (2, 6)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               atol=1e-3, rtol=1e-4)
    # the stats must equal valid-interior sums (borders are clean zeros)
    np.testing.assert_allclose(
        float(stats[0].sum()), float(jnp.sum(y)), rtol=1e-5, atol=1e-3)

    def loss(xf):
        yy, st = conv3_flat(xf, k, b, g, emit_stats=True)
        return jnp.sum(yy ** 2) + jnp.sum(st[1])

    def loss_ref(xf):
        yy, st = _conv3_xla_reference(xf, k, b, None, g, None,
                                      emit_stats=True)
        return jnp.sum(yy ** 2) + jnp.sum(st[1])

    gk = jax.grad(loss)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=5e-4, rtol=1e-3)


def test_conv3_flat_residual_tap_matches_xla():
    """The fused 1x1 residual tap (V-Net's parallel residual branch
    riding the chain conv's kernel): output, stats, and gradients match
    the XLA oracle, incl. through a virtual concat pair."""
    from multimodal_3d_image_segmentation_tpu.kernels.conv3d_flat import (
        conv3_flat, flat_geom, to_flat, _conv3_xla_reference)
    rng = np.random.default_rng(17)
    g = flat_geom(5, 8, 10)
    x1 = to_flat(jnp.asarray(rng.standard_normal((5, 5, 8, 10)),
                             jnp.float32), g)
    x2 = to_flat(jnp.asarray(rng.standard_normal((3, 5, 8, 10)),
                             jnp.float32), g)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 6)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    rk = jnp.asarray(rng.standard_normal((6, 8)) * 0.1, jnp.float32)
    rb = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)

    for pair in (False, True):
        xin = (x1, x2) if pair else jnp.concatenate([x1, x2], axis=1)
        y, r, st, rst = conv3_flat(xin, k, b, g, emit_stats=True,
                                   residual=(rk, rb))
        y_ref, r_ref, st_ref, rst_ref = _conv3_xla_reference(
            x1 if pair else xin, k, b, None, g, None,
            x2=x2 if pair else None, emit_stats=True, res=(rk, rb))
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rst), np.asarray(rst_ref),
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref),
                                   atol=1e-3, rtol=1e-4)
        # tap borders are clean zeros -> whole-array sum == interior sum
        np.testing.assert_allclose(float(rst[0].sum()), float(jnp.sum(r)),
                                   rtol=1e-5, atol=1e-3)

    def loss(xf, kk, bb, rkk, rbb):
        yy, rr, _, rs = conv3_flat((xf, x2), kk, bb, g, emit_stats=True,
                                   residual=(rkk, rbb))
        return jnp.sum(yy ** 2) + jnp.sum(rr ** 2) + jnp.sum(rs[1])

    def loss_ref(xf, kk, bb, rkk, rbb):
        yy, rr, _, rs = _conv3_xla_reference(xf, kk, bb, None, g, None,
                                             x2=x2, emit_stats=True,
                                             res=(rkk, rbb))
        return jnp.sum(yy ** 2) + jnp.sum(rr ** 2) + jnp.sum(rs[1])

    gk = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x1, k, b, rk, rb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x1, k, b, rk, rb)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=1e-3)
