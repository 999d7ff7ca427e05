"""Fused resize+softmax output-tail kernel (kernels/tail_resize.py).

Interpreter-mode parity against the module tail (``ops/resize.py``
matmul trilinear + softmax — itself golden-tested against the PyTorch
reference, ``nets/hnosegxs.py:174-176`` + ``nets/architectures.py:349``),
gradient parity through the custom VJP, the static routing predicate,
and model-level routing equivalence.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.kernels.tail_resize import (
    _d_taps_np, _lo_idx, fused_tail_softmax, maybe_fused_tail,
    tail_supported)
from multimodal_3d_image_segmentation_tpu.ops.resize import resize_linear


def _module_tail(x_cf, sizes, out_dtype):
    y = resize_linear(x_cf, sizes, channel_first=True)
    return jax.nn.softmax(y.astype(out_dtype).astype(jnp.float32),
                          axis=1).astype(out_dtype)


def _rand(shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal(shape).astype(dtype))


@pytest.mark.parametrize("shape,sizes", [
    ((1, 4, 12, 10, 8), (31, 25, 19)),    # odd upsample, all axes
    ((1, 2, 7, 9, 11), (14, 18, 22)),     # exact 2x
    ((1, 3, 6, 8, 8), (6, 8, 8)),         # identity resize
    ((1, 4, 5, 8, 8), (13, 8, 8)),        # D-only resize
    ((1, 2, 16, 6, 6), (9, 11, 13)),      # D downsample + HW upsample
])
def test_fused_tail_matches_module_tail(shape, sizes):
    x = _rand(shape, seed=1)
    want = np.asarray(_module_tail(x, sizes, jnp.float32))
    got = np.asarray(fused_tail_softmax(x, sizes, jnp.float32, True))
    assert got.shape == (1, shape[1]) + sizes
    np.testing.assert_allclose(got, want, atol=1e-4)
    # softmax rows are exact probability distributions
    np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-5)


def test_fused_tail_bf16_input():
    x = _rand((1, 4, 8, 9, 10), seed=2).astype(jnp.bfloat16)
    want = np.asarray(_module_tail(x, (17, 21, 23), jnp.bfloat16)
                      .astype(jnp.float32))
    got = np.asarray(fused_tail_softmax(x, (17, 21, 23), jnp.bfloat16,
                                        True).astype(jnp.float32))
    # module tail casts logits to bf16 pre-softmax; kernel keeps fp32 and
    # casts the probabilities — both land within one bf16 ulp of fp32
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_fused_tail_gradient_matches_module_tail():
    x = _rand((1, 3, 6, 7, 8), seed=3)
    sizes = (13, 15, 17)
    ct = _rand((1, 3) + sizes, seed=4)

    def f_fused(z):
        return jnp.sum(fused_tail_softmax(z, sizes, jnp.float32, True) * ct)

    def f_mod(z):
        return jnp.sum(_module_tail(z, sizes, jnp.float32) * ct)

    g_fused = np.asarray(jax.grad(f_fused)(x))
    g_mod = np.asarray(jax.grad(f_mod)(x))
    np.testing.assert_allclose(g_fused, g_mod, atol=2e-4)


def test_d_tap_index_map_matches_host_taps():
    """The traced block-index-map lo must agree with the host-side taps
    for every (n_in, n_out) the models can produce."""
    for n_in in range(1, 40):
        for n_out in range(1, 40):
            lo_host, w = _d_taps_np(n_in, n_out)
            lo_map = np.asarray([int(_lo_idx(i, n_in, n_out))
                                 for i in range(n_out)])
            np.testing.assert_array_equal(lo_host, lo_map,
                                          err_msg=f"{n_in}->{n_out}")
            assert np.all((w >= 0.0) & (w <= 1.0))


def test_tail_supported_predicate():
    assert tail_supported((1, 4, 24, 24, 20), (96, 96, 80))
    assert not tail_supported((2, 4, 24, 24, 20), (96, 96, 80))   # batch
    assert not tail_supported((1, 16, 24, 24, 20), (96, 96, 80))  # channels
    assert not tail_supported((1, 4, 24, 24), (96, 96))           # 2D
    # full-res planes past the VMEM block budget
    assert not tail_supported((1, 4, 155, 640, 640), (155, 1280, 1280))


def test_maybe_fused_tail_env_gating(monkeypatch):
    x = _rand((1, 2, 4, 4, 4), seed=5)
    monkeypatch.setenv("M3SEG_PALLAS_TAIL", "0")
    assert maybe_fused_tail(x, (8, 8, 8), jnp.float32) is None
    monkeypatch.setenv("M3SEG_PALLAS_TAIL", "1")
    y = maybe_fused_tail(x, (8, 8, 8), jnp.float32)
    assert y is not None and y.shape == (1, 2, 8, 8, 8)


@pytest.mark.parametrize("build", [
    lambda: models.HNOSegXS(in_channels=2, out_channels=3, filters=8,
                            num_transform_blocks=[2, 2],
                            num_modes=(3, 4, 4), use_pallas=True),
    lambda: models.NeuralOperatorSeg(in_channels=2, out_channels=3,
                                     filters=8, num_transform_blocks=2,
                                     num_modes=(3, 4, 4), use_pallas=True),
    lambda: models.VNetDS(in_channels=2, out_channels=3, base_num_filters=4,
                          num_blocks=[1, 2], use_pallas=True),
    lambda: models.HartleyMHASeg(in_channels=2, out_channels=3, filters=8,
                                 num_transform_blocks=2, num_heads=2,
                                 num_modes=(3, 4, 3), patch_size=2,
                                 use_pallas=True),
])
def test_model_tail_routing_equivalence(build, monkeypatch):
    """M3SEG_PALLAS_TAIL=1 (fused kernel, interpret off-TPU) produces the
    same outputs as the module tail, end to end, for every family that
    routes it."""
    model = build()
    x = _rand((1, 2, 16, 16, 12), seed=6)
    monkeypatch.setenv("M3SEG_PALLAS_TAIL", "0")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))["params"]
    y0 = np.asarray(model.apply({"params": params}, x))
    monkeypatch.setenv("M3SEG_PALLAS_TAIL", "1")
    y1 = np.asarray(model.apply({"params": params}, x))
    assert y1.shape == y0.shape
    np.testing.assert_allclose(y1, y0, atol=2e-4)
