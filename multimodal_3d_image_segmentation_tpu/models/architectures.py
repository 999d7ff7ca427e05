"""Segmentation architectures: V-Net-DS and the spectral "flat tower"
family (FNO / FNOSeg / HNOSeg / HartleyMHA).

Re-designs of the reference ``nets/architectures.py``:
  * ``VNetDS`` (``:26-253``): V-Net with deep supervision (MICCAI 2018) —
    encoder/decoder CNN with residual 1x1 adds, deep-supervision "right
    leg", optional learnable input resize.
  * ``_TransSeg`` skeleton (``:255-353``): conv_in -> conv1 -> N transform
    blocks -> optional deep-supervision concat + conv_ds -> upsample ->
    1x1 conv -> softmax.
  * ``NeuralOperatorSeg`` (``:356-429``): FNO/FNOSeg/HNOSeg via
    transform_type / weights_type / block options.
  * ``HartleyMHASeg`` (``:432-508``): tower of Hartley-MHA blocks
    (MICCAI 2023).

Public contract: channel-first input (B, C, *spatial), softmax output
(B, out_channels, *spatial); internally channels-last for TPU layout.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import get_activation, is_selu
from ..ops.attention import HartleyMultiHeadAttention
from ..ops.convs import (ConcatConvNormAct, Conv, ConvNormAct,
                         ConvTransposeNormAct)
from ..ops.operators import FourierOperator, HartleyOperator
from ..ops.padcrop import spatial_padcrop
from ..ops.resize import resize_linear, resize_nearest
from ..ops.spectral import (_isl, _prec, flat_concat_mix,
                            packed_high_channel_mix, packed_high_dcn_mix)

_FUSED_TOWER = None  # tri-state: None -> env M3SEG_TOWER_FUSED (default off)


def set_fused_tower(on) -> None:
    """Force the NeuralOperatorSeg fused-tower routing on/off for A/Bs
    (None -> consult env var ``M3SEG_TOWER_FUSED``; default off — the
    module path measured faster after the round-3 fixes)."""
    global _FUSED_TOWER
    _FUSED_TOWER = on


def _fused_tower_opt_in() -> bool:
    if _FUSED_TOWER is not None:
        return bool(_FUSED_TOWER)
    import os
    return os.environ.get("M3SEG_TOWER_FUSED", "0") not in ("0", "",
                                                            "false")


__all__ = ["VNetDS", "NeuralOperatorSeg", "HartleyMHASeg",
           "NeuralOperatorBlock", "HartleyMHABlock"]


def _to_channels_last(x):
    return x.transpose((0,) + tuple(range(2, x.ndim)) + (1,))


def _to_channel_first(x):
    return x.transpose((0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))


def _apply_output_activation(x, output_activation, axis=-1):
    if output_activation == "softmax":
        return jax.nn.softmax(x, axis=axis)
    act = get_activation(output_activation)
    return act(x) if act is not None else x


def _channel_first_tail(x, image_size, use_resize, in_dtype,
                        output_activation, pallas_ok=False):
    """Shared output tail: transpose channel-first while small, upsample,
    pad/crop, softmax over axis 1 (see hnosegxs.py for rationale —
    few-channel channels-last gathers pay heavy lane padding on TPU).

    ``pallas_ok``: allow the fused resize+softmax tail kernel
    (``kernels/tail_resize.py``) — one HBM pass instead of ~5; the
    resize-to-image-size guarantee makes the pad/crop a no-op there."""
    x = _to_channel_first(x)
    if pallas_ok and use_resize and output_activation == "softmax":
        from ..kernels.tail_resize import maybe_fused_tail
        y = maybe_fused_tail(x, image_size, in_dtype)
        if y is not None:
            return y
    if use_resize:
        x = resize_linear(x, image_size, channel_first=True)
    x = spatial_padcrop(x, image_size, channel_first=True)
    x = x.astype(in_dtype)
    return _apply_output_activation(x, output_activation, axis=1)


class _TransBlockMixin:
    """Shared forward skeleton of the tower blocks
    (reference ``nets/architectures.py:511-548``)."""

    def _block_tail(self, x1, x2, tmp):
        assert x1 is not None or x2 is not None
        if x1 is not None and x2 is not None:
            x = x1 + x2
        else:
            x = x1 if x1 is not None else x2

        if not is_selu(self.activation):
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             name="normalization")(x)
        act = get_activation(self.activation)
        if act is not None:
            x = act(x)

        if self.use_block_skip:
            if self.use_block_concat:
                x = ConcatConvNormAct(self.out_channels, use_bias=True,
                                      activation=self.activation,
                                      use_snn=is_selu(self.activation),
                                      name="conv_concat")((x, tmp))
            else:
                x = x + tmp
        return x


class NeuralOperatorBlock(nn.Module, _TransBlockMixin):
    """FNO/HNO block: spectral operator branch + parallel 1x1 conv branch,
    add, (norm), activation, block skip
    (reference ``nets/architectures.py:551-608``)."""
    in_channels: int
    out_channels: int
    num_modes: Union[int, Sequence[int]]
    transform_type: str
    weights_type: str = "shared"
    activation: Union[str, Callable, None] = "selu"
    use_conv_branch: bool = True
    use_bias_conv_branch: bool = False
    use_block_skip: bool = True
    use_block_concat: bool = True

    @nn.compact
    def __call__(self, x):
        assert self.transform_type in ("Fourier", "Hartley")
        snn = is_selu(self.activation)
        op_cls = (FourierOperator if self.transform_type == "Fourier"
                  else HartleyOperator)
        x1 = op_cls(self.in_channels, self.out_channels, self.num_modes,
                    use_bias=False, weights_type=self.weights_type,
                    snn_init=snn, name="op")(x)
        x2 = None
        if self.use_conv_branch:
            x2 = Conv(self.out_channels, 1,
                      use_bias=self.use_bias_conv_branch, snn_init=snn,
                      name="conv_branch")(x)
        return self._block_tail(x1, x2, x)


class HartleyMHABlock(nn.Module, _TransBlockMixin):
    """Hartley-MHA block (reference ``nets/architectures.py:611-635``)."""
    in_channels: int
    out_channels: int  # == key_dim
    num_heads: int
    num_modes: Union[int, Sequence[int]]
    patch_size: Optional[Union[int, Sequence[int]]] = None
    attention_activation: Union[str, Callable, None] = "selu"
    activation: Union[str, Callable, None] = "selu"
    use_conv_branch: bool = True
    use_bias_conv_branch: bool = False
    use_block_skip: bool = True
    use_block_concat: bool = True

    @nn.compact
    def __call__(self, x):
        snn = is_selu(self.activation)
        # NOTE: the reference SNN re-init does not touch MHA projections
        # (``nets/nets_utils.py:108-117`` lists convs + operators only), so
        # the attention weights always use the default init.
        x1 = HartleyMultiHeadAttention(
            self.in_channels, self.out_channels, self.num_heads,
            self.num_modes, patch_size=self.patch_size,
            attention_activation=self.attention_activation,
            snn_init=False, name="op")(x)
        x2 = None
        if self.use_conv_branch:
            x2 = Conv(self.out_channels, 1,
                      use_bias=self.use_bias_conv_branch, snn_init=snn,
                      name="conv_branch")(x)
        return self._block_tail(x1, x2, x)


class _TransSegBase(nn.Module):
    """Shared tower forward (reference ``nets/architectures.py:282-353``)."""

    def _use_pallas_entry(self, x_cf) -> bool:
        """Route the module path's entry conv through the fused Pallas
        conv_in kernel. The XLA module entry marshals the channel-first
        input through a pad + relayout copy + two full-resolution
        transposes before the stride-2 conv (~690 MB of HBM traffic at
        the bench shape, seen in the optimized HLO); ``conv_in_s2d``
        reads the raw channel-first tensor once and emits the
        channels-last tower grid directly. Env override
        ``M3SEG_PALLAS_ENTRY``: "1" forces on (interpret mode off-TPU,
        for tests), "0" forces off, default auto (TPU only)."""
        import os
        mode = os.environ.get("M3SEG_PALLAS_ENTRY", "auto")
        if mode == "0":
            return False
        return (getattr(self, "use_pallas", False) and self.ndim == 5
                and self.use_resize and self.channel_first_io
                and x_cf.shape[0] == 1 and is_selu(self.activation)
                and (mode == "1" or jax.default_backend() == "tpu"))

    def _fused_entry(self, x):
        """conv_in (+ SELU) and conv1 into the tower flat layout:
        channel-first (1, C, D, H, W) -> ((D, F, W*HL), tower sizes)."""
        from ..kernels import tower_block as tb
        from .hnosegxs import _FlatConcatConv
        if self.use_resize:
            x_flat, sizes = _TowerConvIn(self.filters, x.shape[1],
                                         name="conv_in")(x)
        else:
            d, h, w = x.shape[2:]
            hl = tb._ceil128(h)
            xt = jnp.transpose(x[0], (1, 0, 3, 2))   # (D, C, W, H)
            xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, hl - h)))
            x_flat = xt.reshape(d, x.shape[1], w * hl)
            sizes = (d, h, w)
        x_flat = _FlatConcatConv(self.filters, x_flat.shape[1],
                                 name="conv1")((x_flat,))
        return x_flat, sizes

    def _fused_exit(self, x_flat, sizes, image_size, in_dtype):
        from ..kernels import tower_block as tb
        x = tb.from_tower_flat(x_flat, sizes, self.out_channels)
        if self.use_resize and self.output_activation == "softmax":
            from ..kernels.tail_resize import maybe_fused_tail
            y = maybe_fused_tail(x, image_size, in_dtype)
            if y is not None:
                return y
        if self.use_resize:
            x = resize_linear(x, image_size, channel_first=True)
        x = spatial_padcrop(x, image_size, channel_first=True)
        x = x.astype(in_dtype)
        return _apply_output_activation(x, self.output_activation, axis=1)

    def _fused_tail(self, x_flat, ds, mds, bds, n_blocks, sizes,
                    image_size, in_dtype):
        """Shared fused-path tail: the last deep-supervision leg (the
        final block's output projected by conv_ds's trailing rows) +
        conv_ds bias + SELU, then the conv_out 1x1 mix and the exit."""
        from .hnosegxs import _Conv1x1Weight
        if ds is not None:
            last = mds[n_blocks * self.filters:]
            ds = ds + packed_high_dcn_mix(
                x_flat.astype(jnp.float32), last)
            ds = ds + bds.astype(jnp.float32)[None, :, None]
            x_flat = jax.nn.selu(ds).astype(x_flat.dtype)
        kern = _Conv1x1Weight(self.out_channels, x_flat.shape[1], True,
                              name="conv_out")()
        mat = kern.reshape(x_flat.shape[1], self.out_channels)
        x_flat = packed_high_dcn_mix(x_flat, mat)
        return self._fused_exit(x_flat, sizes, image_size, in_dtype)

    def _tower(self, x, make_block, x_entry=None):
        snn = is_selu(self.activation)
        in_dtype = x.dtype
        tensors = []

        if x_entry is not None:
            # Pallas entry (``_use_pallas_entry``): x is the raw
            # channel-first input (bookkeeping only); x_entry is the
            # post-conv_in channels-last tower tensor
            image_size = x.shape[2:]
            x = x_entry
        else:
            x = x.astype(self.compute_dtype)
            image_size = x.shape[1:-1]
            if self.use_resize:
                x = ConvNormAct(self.filters, kernel_size=2, strides=2,
                                use_bias=True, activation=self.activation,
                                use_snn=snn, name="conv_in")(x)

        # Deep supervision: the reference concatenates every block output
        # and reduces with conv_ds (nets/architectures.py:300-341). A
        # virtual concat avoids materializing the stack, but holding all
        # nb+1 full-grid parts live until the tail still peaks at
        # ~(nb+1) volume buffers (measured 3.24 GiB on the 24-block MHA
        # tower). Fold each part's conv_ds rows into a running
        # out_channels-wide accumulator instead — identical addition
        # order to ConcatConvNormAct's split-kernel sum (bit-exact),
        # identical param tree (conv_ds/conv/{kernel,bias}), peak live
        # set ~2 volume buffers. SNN/3-D only (the non-SNN tail needs
        # conv_ds/norm GroupNorm params -> legacy list path).
        mds = bds = ds_acc = None
        if self.use_deep_supervision and snn and self.ndim == 5:
            fan_in = self.filters * (1 + self.num_transform_blocks)
            kds, bds = _CCHolder(self.out_channels, fan_in,
                                 name="conv_ds")()
            mds = kds.reshape(fan_in, self.out_channels)

        def ds_fold(acc, part, idx):
            off = idx * self.filters
            p = packed_high_channel_mix(
                "...i,io->...o", part, mds[off:off + self.filters], -1)
            return p if acc is None else acc + p

        x = ConvNormAct(self.filters, use_bias=True,
                        activation=self.activation, use_snn=snn,
                        name="conv1")(x)
        if self.use_deep_supervision:
            if mds is not None:
                ds_acc = ds_fold(ds_acc, x, 0)
            else:
                tensors.append(x)

        cur_in = self.filters
        for i in range(self.num_transform_blocks):
            x = make_block(i, cur_in)(x)
            cur_in = self.filters
            if self.use_deep_supervision:
                if mds is not None:
                    ds_acc = ds_fold(ds_acc, x, i + 1)
                else:
                    tensors.append(x)

        if ds_acc is not None:
            ds_acc = ds_acc + bds.astype(ds_acc.dtype)
            x = get_activation(self.activation)(ds_acc)
        elif tensors:
            # conv_ds avoids OOM on the concatenated deep-supervision stack;
            # the concat stays virtual (split-kernel 1x1)
            x = ConcatConvNormAct(self.out_channels, use_bias=True,
                                  activation=self.activation, use_snn=snn,
                                  name="conv_ds")(tuple(tensors))

        # conv_out (1x1, linear) commutes with the per-channel linear
        # resize; apply it at the small grid, then run the tail
        # channel-first (output is channel-first anyway).
        x = Conv(self.out_channels, 1, use_bias=False, snn_init=snn,
                 name="conv_out")(x)
        return _channel_first_tail(x, image_size, self.use_resize, in_dtype,
                                   self.output_activation,
                                   pallas_ok=getattr(self, "use_pallas",
                                                     False))


class _TowerEntryCL(nn.Module):
    """Module-path tower entry conv (k=2/s=2/pad=1 + SELU) via the fused
    Pallas kernel: channel-first raw input -> channels-last tower grid,
    skipping the XLA entry's full-resolution marshalling.
    ConvNormAct's exact parameter tree (``conv_in/conv/{kernel,bias}``)."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self, x_cf):
        from ..kernels.conv_in import conv_in_s2d
        from .hnosegxs import _ConvParams
        kernel, bias = _ConvParams(self.features, self.in_features, 2,
                                   True, name="conv")()
        return conv_in_s2d(x_cf, kernel.astype(_isl(x_cf.dtype)),
                           bias.astype(_isl(x_cf.dtype)), apply_selu=True)


class _TowerConvIn(nn.Module):
    """Tower entry conv (k=2/s=2) via the fused Pallas kernel, reading the
    raw channel-first input and emitting the tower flat layout
    ``(D, C, W*HL)`` (H on the lane axis). ConvNormAct's exact parameter
    tree (``conv_in/conv/{kernel,bias}``); SELU fused in the kernel."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self, x_cf):
        from ..kernels.conv_in import conv_in_s2d
        from ..kernels.tower_block import _ceil128
        from .hnosegxs import _ConvParams
        kernel, bias = _ConvParams(self.features, self.in_features, 2,
                                   True, name="conv")()
        y = conv_in_s2d(x_cf, kernel.astype(_isl(x_cf.dtype)),
                        bias.astype(_isl(x_cf.dtype)), channels_middle=True,
                        apply_selu=True)
        y = jnp.transpose(y[0], (0, 2, 3, 1))       # (D, F, W, H)
        d, f, w, h = y.shape
        hl = _ceil128(h)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, hl - h)))
        return y.reshape(d, f, w * hl), (d, h, w)


class _FourierOpWeight(nn.Module):
    """Param-only holder for FourierOperator's complex weight pair
    (``<name>/{weight_real,weight_imag}``)."""
    out_channels: int
    in_channels: int
    snn_init: bool

    @nn.compact
    def __call__(self):
        from ..ops import initializers as inits
        init = (inits.kaiming_normal_linear(self.in_channels)
                if self.snn_init
                else inits.kaiming_uniform_a5(self.in_channels))
        shape = (self.out_channels, self.in_channels)
        return (self.param("weight_real", init, shape),
                self.param("weight_imag", init, shape))


class _TowerBlockParams(nn.Module):
    """Param-only holder for one fused tower block; tree identical to
    NeuralOperatorBlock (``<name>/op``, ``<name>/conv_branch``,
    ``<name>/conv_concat/conv``)."""
    channels: int
    transform: str

    @nn.compact
    def __call__(self):
        from .hnosegxs import _Conv1x1Weight, _ConvParams, _OpWeight
        c = self.channels
        if self.transform == "Hartley":
            op = (_OpWeight(c, c, True, name="op")(),)
        else:
            op = _FourierOpWeight(c, c, True, name="op")()
        conv_b = _Conv1x1Weight(c, c, True, name="conv_branch")()
        cc_k, cc_b = _CCHolder(c, 2 * c, name="conv_concat")()
        mat_conv = conv_b.reshape(c, c)
        mat_cc = cc_k.reshape(2 * c, c)
        w_cat = jnp.concatenate([mat_conv.T, mat_cc[c:].T], axis=0)
        w_cc_t = mat_cc[:c].T
        b_cat = jnp.concatenate([jnp.zeros_like(cc_b), cc_b])
        return op, w_cat, w_cc_t, b_cat


class _CCHolder(nn.Module):
    """ConcatConvNormAct param tree (``<name>/conv/{kernel,bias}``)."""
    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        from .hnosegxs import _ConvParams
        return _ConvParams(self.features, self.fan_in, 1, True,
                           name="conv")()


class NeuralOperatorSeg(_TransSegBase):
    """FNO / FNOSeg / HNOSeg family (reference
    ``nets/architectures.py:356-429``).

    ``use_pallas``: run the fused tower-block Pallas path
    (``kernels/tower_block.py``) — one HBM round trip per block instead
    of the module path's per-stage passes. Gated on: TPU, 3D, batch 1,
    ``compute_dtype='bfloat16'`` (at fp32 the module path measured
    faster — docs/DESIGN.md §8b), channel-first IO, shared weights,
    SELU, block skip+concat, no conv-branch bias; falls back to the
    module path otherwise (deep supervision IS supported — it rides the
    kernel's packed dot). Parameter trees are identical, so checkpoints
    are interchangeable."""
    in_channels: int
    out_channels: int
    filters: int
    num_transform_blocks: int
    num_modes: Union[int, Sequence[int]]
    transform_type: str = "Hartley"
    weights_type: str = "shared"
    use_resize: bool = True
    use_deep_supervision: bool = False
    use_bias_conv_branch: bool = False
    use_block_skip: bool = True
    use_block_concat: bool = True
    activation: Union[str, Callable, None] = "selu"
    output_activation: Union[str, Callable, None] = "softmax"
    ndim: int = 5
    channel_first_io: bool = True
    compute_dtype: str = "float32"
    use_pallas: bool = False

    def _use_fused_tower(self, x_cf):
        # OFF by default since the round-3 re-measurement FLIP: after the
        # inverse-transform axis-order fix and the native single-pass
        # bf16 conv dot, the XLA module path measures 20.4/22.3 ms
        # (Fourier/Hartley bf16, bench shape) vs 50-53 ms fused — the
        # fused kernel's one-HBM-pass-per-block advantage no longer
        # covers its VMEM roll/dot costs. The fused path stays reachable
        # for A/Bs via ``set_fused_tower(True)`` / M3SEG_TOWER_FUSED=1
        # (v5 variant additionally via ``tower_block_s.set_enabled``).
        # Full measurement record: docs/DESIGN.md §8b.
        return (_fused_tower_opt_in()
                and self.use_pallas and self.ndim == 5
                and self.compute_dtype == "bfloat16"
                and self.channel_first_io and x_cf.shape[0] == 1
                and self.weights_type == "shared"
                and is_selu(self.activation)
                and self.use_block_skip and self.use_block_concat
                and not self.use_bias_conv_branch
                and jax.default_backend() == "tpu")

    def _fused_tower_forward(self, x_cf):
        from ..kernels import tower_block as tb
        from ..kernels import tower_block_s as tbs
        from ..ops.spectral import clip_modes, normalize_modes

        interpret = jax.default_backend() != "tpu"
        in_dtype = x_cf.dtype
        x = x_cf.astype(self.compute_dtype)
        image_size = x.shape[2:]

        x_flat, sizes = self._fused_entry(x)
        n_ds = self.out_channels if self.use_deep_supervision else 0
        modes = clip_modes(normalize_modes(self.num_modes, 3), sizes)
        # v5 kernel (in-kernel depth stages, resident spectrum carry) vs
        # v2 (per-plane f/z spectra exchanged with XLA) — measurement-
        # gated A/B (docs/ROADMAP.md; M3SEG_TOWER_S / tbs.set_enabled)
        use_s = tbs.is_enabled()
        if use_s:
            spec = tbs.make_tower_spec_s(self.transform_type, sizes,
                                         modes, self.filters, n_ds=n_ds)
            f = tbs.entry_spectrum_s(x_flat, spec)
        else:
            spec = tb.make_tower_spec(self.transform_type, sizes, modes,
                                      self.filters, n_ds=n_ds)
            # f rides the volume dtype (the kernel emits it likewise, so
            # the scan carry types line up); in bf16 mode this halves the
            # spectrum's per-block HBM round trip. The D-stage
            # contractions pin their compute to fp32
            # (kernels/tower_block.py), so accumulation is unchanged.
            f = tb.entry_forward_hw(x_flat, spec)

        n_blocks = self.num_transform_blocks
        blocks = [_TowerBlockParams(self.filters, self.transform_type,
                                    name=f"layers_{i}")()
                  for i in range(n_blocks)]
        mds = bds = None
        if n_ds:
            fan_in = self.filters * (n_blocks + 1)
            kds, bds = _CCHolder(self.out_channels, fan_in,
                                 name="conv_ds")()
            mds = kds.reshape(fan_in, self.out_channels)
            c = self.filters
            blocks = [(op, jnp.concatenate(
                          [w_cat, mds[i * c:(i + 1) * c].T], axis=0),
                       w_cc_t, b_cat)
                      for i, (op, w_cat, w_cc_t, b_cat)
                      in enumerate(blocks)]

        # NOTE: a VMEM-resident whole-tower variant exists
        # (kernels/tower_resident.py) but measured SLOWER than this
        # per-block scan (102.5 ms whole Fourier tower vs 1.44 ms/block
        # here; its 121-plane fori_loop serializes into latency-bound
        # small ops) — see docs/DESIGN.md §8b. Not routed.

        # one scan over stacked per-block weights: a single traced block
        # body (and a single Mosaic kernel compile) instead of 24
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *blocks)

        def body(carry, wts):
            xf, fv = carry[0], carry[1]
            op, w_cat, w_cc_t, b_cat = wts
            # the ds accumulator rides the kernel (ds_out = ds_prev +
            # this block's projection) — no XLA carry-add pass
            dsp = (carry[2],) if n_ds else ()
            if use_s:
                sy = tbs.spectrum_mix_s(fv, op, spec)
                res = tbs.fused_tower_block_s(xf, sy, w_cat, w_cc_t,
                                              b_cat, spec, interpret,
                                              *dsp)
            else:
                z = tb.block_spectrum_update(fv, op, spec)
                res = tb.fused_tower_block(xf, z, w_cat, w_cc_t, b_cat,
                                           spec, interpret, *dsp)
            if n_ds:
                return (res[0], res[1], res[2]), None
            return (res[0], res[1]), None

        d = sizes[0]
        npl = x_flat.shape[-1]
        carry0 = (x_flat, f) + (
            (jnp.zeros((d, n_ds, npl), jnp.float32),) if n_ds else ())
        carry, _ = jax.lax.scan(body, carry0, stacked)
        x_flat = carry[0]
        ds = carry[2] if n_ds else None

        return self._fused_tail(x_flat, ds, mds, bds, n_blocks, sizes,
                                image_size, in_dtype)

    @nn.compact
    def __call__(self, x):
        assert self.transform_type in ("Fourier", "Hartley")
        assert self.ndim in (4, 5)
        if self.channel_first_io and self._use_fused_tower(x):
            return self._fused_tower_forward(x)
        x_entry = None
        if self.channel_first_io:
            if self._use_pallas_entry(x):
                x_entry = _TowerEntryCL(self.filters, x.shape[1],
                                        name="conv_in")(
                    x.astype(self.compute_dtype))
            else:
                x = _to_channels_last(x)

        def make_block(i, cur_in):
            return NeuralOperatorBlock(
                cur_in, self.filters, self.num_modes, self.transform_type,
                weights_type=self.weights_type, activation=self.activation,
                use_bias_conv_branch=self.use_bias_conv_branch,
                use_block_skip=self.use_block_skip,
                use_block_concat=self.use_block_concat, name=f"layers_{i}")

        x = self._tower(x, make_block, x_entry)  # returns channel-first
        if not self.channel_first_io:
            x = _to_channels_last(x)
        return x


class _MHATowerBlock(nn.Module):
    """Fused HartleyMHA tower block's spectrum update + param holders.
    Tree identical to HartleyMHABlock (``<name>/op`` = the real
    HartleyMultiHeadAttention module in its ``use_transform=False``
    frequency-resident mode, plus the conv_branch / conv_concat
    holders)."""
    channels: int
    num_heads: int
    num_modes: Union[int, Sequence[int]]
    patch_size: Optional[Union[int, Sequence[int]]]
    attention_activation: Union[str, Callable, None]

    @nn.compact
    def __call__(self, s_cl):
        from .hnosegxs import _Conv1x1Weight
        c = self.channels
        # NOTE snn_init=False: the reference SNN re-init skips MHA
        # projections (see HartleyMHABlock above)
        y_cl = HartleyMultiHeadAttention(
            c, c, self.num_heads, self.num_modes,
            patch_size=self.patch_size,
            attention_activation=self.attention_activation,
            use_transform=False, snn_init=False, name="op")(s_cl)
        conv_b = _Conv1x1Weight(c, c, True, name="conv_branch")()
        cc_k, cc_b = _CCHolder(c, 2 * c, name="conv_concat")()
        mat_conv = conv_b.reshape(c, c)
        mat_cc = cc_k.reshape(2 * c, c)
        w_cat = jnp.concatenate([mat_conv.T, mat_cc[c:].T], axis=0)
        w_cc_t = mat_cc[:c].T
        b_cat = jnp.concatenate([jnp.zeros_like(cc_b), cc_b])
        return y_cl, w_cat, w_cc_t, b_cat


class HartleyMHASeg(_TransSegBase):
    """HartleyMHA architecture (reference
    ``nets/architectures.py:432-508``).

    ``use_pallas``: the MHA tower shares the tower block's full-res
    structure (DHT -> spectrum op -> inverse -> conv branch -> concat
    skip), so the same fused Pallas kernel applies — only the
    between-kernel spectrum update differs (the real
    HartleyMultiHeadAttention module in frequency-resident mode)."""
    in_channels: int
    out_channels: int
    filters: int
    num_transform_blocks: int
    num_heads: int
    num_modes: Union[int, Sequence[int]]
    patch_size: Optional[Union[int, Sequence[int]]] = None
    attention_activation: Union[str, Callable, None] = "selu"
    use_resize: bool = True
    use_deep_supervision: bool = True
    use_bias_conv_branch: bool = False
    use_block_skip: bool = True
    use_block_concat: bool = True
    activation: Union[str, Callable, None] = "selu"
    output_activation: Union[str, Callable, None] = "softmax"
    ndim: int = 5
    channel_first_io: bool = True
    compute_dtype: str = "float32"
    use_pallas: bool = False

    def _use_fused_tower(self, x_cf):
        from ..ops import spectral
        from ..ops.spectral import normalize_modes
        # the kernel's fp32 dots are packed bf16x3 ('high'-class, ~1e-5
        # rel.) — honor an explicit HIGHEST exactness request by serving
        # the module path (fused wins only under the 'high' serving mode:
        # 52.7 vs 67.1 ms, docs/DESIGN.md §8b)
        if (self.compute_dtype != "bfloat16"
                and spectral.PRECISION == jax.lax.Precision.HIGHEST):
            return False
        # bf16: the round-4 zoo re-check mirrors the FNO/HNO flip — the
        # module path (26.73 ms) beats the fused kernel (39.72 ms) once
        # the inverse-axis-order + single-pass bf16 dot fixes landed, so
        # MHA fuses ONLY at fp32-'high' (50.86 vs 53.88 module, same
        # rerun). M3SEG_TOWER_FUSED=1 keeps the bf16 fused path
        # reachable for A/Bs (BENCH_ZOO.json round 4; DESIGN.md §8b).
        if self.compute_dtype == "bfloat16" and not _fused_tower_opt_in():
            return False
        if not (self.use_pallas and self.ndim == 5
                and self.channel_first_io and x_cf.shape[0] == 1
                and is_selu(self.activation)
                and self.use_block_skip and self.use_block_concat
                and not self.use_bias_conv_branch
                and jax.default_backend() == "tpu"):
            return False
        # MHA does not clip modes (reference asserts instead); only
        # fuse when the tower grid fits the requested modes
        d, h, w = x_cf.shape[2:]
        if self.use_resize:
            d, h, w = d // 2 + 1, h // 2 + 1, w // 2 + 1
        modes = normalize_modes(self.num_modes, 3)
        return all(s >= 2 * m for s, m in zip((d, h, w), modes))

    def _fused_mha_forward(self, x_cf):
        from ..kernels import tower_block as tb
        from ..kernels import tower_block_s as tbs
        from ..ops.spectral import normalize_modes

        interpret = jax.default_backend() != "tpu"
        in_dtype = x_cf.dtype
        x = x_cf.astype(self.compute_dtype)
        image_size = x.shape[2:]

        x_flat, sizes = self._fused_entry(x)
        n_ds = self.out_channels if self.use_deep_supervision else 0
        modes = normalize_modes(self.num_modes, 3)
        use_s = tbs.is_enabled()
        if use_s:
            spec = tbs.make_tower_spec_s("Hartley", sizes, modes,
                                         self.filters, n_ds=n_ds)
            f = tbs.entry_spectrum_s(x_flat, spec)
        else:
            spec = tb.make_tower_spec("Hartley", sizes, modes,
                                      self.filters, n_ds=n_ds)
            f = tb.entry_forward_hw(x_flat, spec)

        n_blocks = self.num_transform_blocks
        mds = bds = None
        if n_ds:
            fan_in = self.filters * (n_blocks + 1)
            kds, bds = _CCHolder(self.out_channels, fan_in,
                                 name="conv_ds")()
            mds = kds.reshape(fan_in, self.out_channels)

        d = sizes[0]
        npl = x_flat.shape[-1]
        ds = jnp.zeros((d, n_ds, npl), jnp.float32) if n_ds else None
        c = self.filters
        # unrolled (flax modules per block); the pallas kernel is
        # identical across blocks so Mosaic compiles once
        for i in range(n_blocks):
            if use_s:
                # f IS the resident packed spectrum; the MHA module sees
                # the true (unpadded) W extent — zero pad lanes would add
                # spatial positions to the flattened attention
                s = f.reshape(spec.kd, c, spec.kh,
                              spec.kwl)[..., :spec.kw]
            else:
                s = tb.d_stage_forward(f, spec)       # (KD, C, KH, KW)
            s_cl = jnp.transpose(s, (0, 2, 3, 1))[None]
            y_cl, w_cat, w_cc_t, b_cat = _MHATowerBlock(
                c, self.num_heads, self.num_modes, self.patch_size,
                self.attention_activation, name=f"layers_{i}")(s_cl)
            y = jnp.transpose(y_cl[0], (0, 3, 1, 2))
            if n_ds:
                w_cat = jnp.concatenate(
                    [w_cat, mds[i * c:(i + 1) * c].T], axis=0)
            dsp = (ds,) if n_ds else ()
            if use_s:
                sy = jnp.pad(y.astype(jnp.float32),
                             [(0, 0)] * 3 + [(0, spec.kwl - spec.kw)])
                sy = sy.reshape(spec.kd, c * spec.kh, spec.kwl)
                res = tbs.fused_tower_block_s(x_flat, sy, w_cat, w_cc_t,
                                              b_cat, spec, interpret,
                                              *dsp)
            else:
                z = tb.d_stage_inverse(y, spec)
                res = tb.fused_tower_block(x_flat, z, w_cat, w_cc_t,
                                           b_cat, spec, interpret, *dsp)
            x_flat, f = res[0], res[1]
            if n_ds:
                ds = res[2]

        return self._fused_tail(x_flat, ds, mds, bds, n_blocks, sizes,
                                image_size, in_dtype)

    @nn.compact
    def __call__(self, x):
        assert self.ndim in (4, 5)
        if self.channel_first_io and self._use_fused_tower(x):
            return self._fused_mha_forward(x)
        x_entry = None
        if self.channel_first_io:
            if self._use_pallas_entry(x):
                x_entry = _TowerEntryCL(self.filters, x.shape[1],
                                        name="conv_in")(
                    x.astype(self.compute_dtype))
            else:
                x = _to_channels_last(x)

        def make_block(i, cur_in):
            return HartleyMHABlock(
                cur_in, self.filters, self.num_heads, self.num_modes,
                patch_size=self.patch_size,
                attention_activation=self.attention_activation,
                activation=self.activation,
                use_bias_conv_branch=self.use_bias_conv_branch,
                use_block_skip=self.use_block_skip,
                use_block_concat=self.use_block_concat, name=f"layers_{i}")

        x = self._tower(x, make_block, x_entry)  # returns channel-first
        if not self.channel_first_io:
            x = _to_channels_last(x)
        return x


def _flat_gn_eff(y, g, scale, bias, eps=1e-5, stats=None, g_local=None,
                 psum_axis=None):
    """Effective per-channel (scale, shift) of GroupNorm(1) on a flat
    tensor: ``normalize(y) == y * eff_scale + eff_shift``. Borders may be
    dirty: moment sums mask them inside the (fused) reductions and the
    static valid count makes the stats exact.

    ``stats``: optional kernel-emitted per-channel (2, C) moment sums
    (``conv3_flat(emit_stats=True)``) — skips the stats read pass.
    Depth-sharded tensors (``parallel/flat_sharded.py``) pass the LOCAL
    geometry as ``g_local`` (``g`` stays the global one, fixing the valid
    count) and ``psum_axis`` to make the moment sums global."""
    c = y.shape[1]
    n_valid = g.d * g.h * g.w * c
    gl = g if g_local is None else g_local
    if stats is not None:
        s = jnp.sum(stats[0].astype(jnp.float32))
        s2 = jnp.sum(stats[1].astype(jnp.float32))
    else:
        mask = jnp.asarray(gl.interior_mask(), jnp.float32)  # (1, Npl)
        yin = y[1:gl.d + 1].astype(jnp.float32) * mask[None]
        s = jnp.sum(yin)
        s2 = jnp.sum(jax.lax.square(yin))
    if psum_axis is not None:
        s = jax.lax.psum(s, psum_axis)
        s2 = jax.lax.psum(s2, psum_axis)
    m = s / n_valid
    var = s2 / n_valid - m * m
    inv = jax.lax.rsqrt(var + eps)
    eff_scale = (inv * scale.astype(jnp.float32)).astype(y.dtype)
    eff_shift = (bias.astype(jnp.float32)
                 - m * inv * scale.astype(jnp.float32)).astype(y.dtype)
    return eff_scale, eff_shift


def _flat_gn_act(y, g, scale, bias, activation, eps=1e-5, stats=None,
                 g_local=None, psum_axis=None):
    """GroupNorm(1) + activation on a flat tensor (materialized). Output
    borders stay/become dirty — downstream flat consumers sanitize."""
    eff_scale, eff_shift = _flat_gn_eff(y, g, scale, bias, eps, stats,
                                        g_local, psum_axis)
    out = y * eff_scale[None, :, None] + eff_shift[None, :, None]
    act = get_activation(activation)
    return act(out) if act is not None else out


class _GNParams(nn.Module):
    """Param-only holder matching nn.GroupNorm's tree (scale, bias)."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


@functools.lru_cache(maxsize=32)
def _lane_src_indices_np(g_src, g_dst, mapping):
    """Per-destination-lane source index (int32; -1 = zero output).

    ``mapping``: 'decimate2' (dst (h,w) <- src (2h, 2w)),
    'interleave2' (dst (2h, 2w) <- src (h, w); other dst lanes zero),
    ('crop', oh, ow) (dst (h,w) <- src (h+oh, w+ow)), 'nearest'
    (floor-index nearest-neighbor map, exactly ``resize_nearest``'s
    formula). Destination borders always map to zero (clean)."""
    idx = np.full((g_dst.npl,), -1, np.int32)
    for h in range(g_dst.h):
        for w in range(g_dst.w):
            if mapping == "decimate2":
                sh, sw = 2 * h, 2 * w
            elif mapping == "interleave2":
                if h % 2 or w % 2:
                    continue
                sh, sw = h // 2, w // 2
            elif mapping == "nearest":
                sh = min(int(np.floor(h * (g_src.h / g_dst.h))),
                         g_src.h - 1)
                sw = min(int(np.floor(w * (g_src.w / g_dst.w))),
                         g_src.w - 1)
            elif mapping[0] == "crop":
                sh, sw = h + mapping[1], w + mapping[2]
            else:
                raise ValueError(mapping)
            if sh >= g_src.h or sw >= g_src.w:
                continue
            idx[(h + 1) * g_dst.wp + (w + 1)] = (sh + 1) * g_src.wp + (sw + 1)
    return idx


def _lane_selection(g_src, g_dst, mapping, dtype):
    """Build the (Npl_src, Npl_dst) 0/1 selection matrix ON DEVICE from the
    small index vector (an iota comparison) — embedding the dense matrix
    as a program constant blows the compile-request size at L0 scale."""
    idx = _lane_src_indices_np(g_src, g_dst, mapping)  # numpy const
    iota = jax.lax.broadcasted_iota(jnp.int32, (g_src.npl, g_dst.npl), 0)
    return (iota == idx[None, :]).astype(dtype)


def _flat_crop(x, g_src, g_dst, shard=None):
    """Center-crop a flat volume to a smaller geometry, exactly matching
    ``spatial_padcrop``'s crop offsets (lo = d//2 per axis). Depth-sharded
    tensors (``shard``) can only need (H, W) crops — at sharded levels the
    decode up-sample doubles an even depth exactly, so ``g_src.d ==
    g_dst.d`` there (asserted)."""
    od = (g_src.d - g_dst.d) // 2
    oh = (g_src.h - g_dst.h) // 2
    ow = (g_src.w - g_dst.w) // 2
    if shard is not None:
        assert od == 0 and g_src.d == g_dst.d, (
            "sharded _flat_crop cannot crop depth")
        planes = x[1:-1]
    else:
        planes = x[1 + od:1 + od + g_dst.d]
    planes = jnp.pad(planes, ((1, 1), (0, 0), (0, 0)))
    if (g_src.h, g_src.w) == (g_dst.h, g_dst.w) and g_src.npl == g_dst.npl:
        return planes
    if (oh == 0 and ow == 0 and g_src.wp == g_dst.wp
            and g_src.npl == g_dst.npl):
        # Same plane stride, no (H, W) offset — the V-Net's 2x-up
        # off-by-one crops ((2k, 2k, w) -> (2k-1, 2k-1, w)): every
        # surviving position sits at the SAME lane in both layouts, so
        # the crop is just the destination interior mask (zeroes the
        # cropped H rows and re-cleans borders) on the depth-sliced
        # planes. One fusable elementwise pass instead of the dense
        # (Npl, Npl) selection matmul, which is MXU-bound at L0 scale
        # (9.7 ms standalone vs ~0.3; round-5 ablation,
        # tools/ablate_vnet_flat.py). Values identical to the einsum.
        mask = jnp.asarray(g_dst.interior_mask(), x.dtype)
        return planes * mask[None]
    sel = _lane_selection(g_src, g_dst, ("crop", oh, ow), x.dtype)
    return jnp.einsum("dcn,nm->dcm", planes, sel, precision=_prec(x.dtype))


def _flat_nearest_upsample(x, g_src, g_dst, src_shard=None, dst_shard=None):
    """Nearest-neighbor upsample in flat space (floor indexing, exactly
    ``resize_nearest``): D via an interior plane gather, (H, W) via a 0/1
    lane-selection einsum. Destination borders come out clean.

    Depth sharding: with ``dst_shard`` set the result is the destination
    shard's local slab. A sharded source needs no communication — for
    the V-Net's exact power-of-two depth ratios the floor map splits as
    ``floor(j_global * r) = shard_offset_src + floor(j_local * r)``, so
    the gather indices are shard-agnostic statics; a replicated source
    is sliced with the shard's (traced) global offsets."""
    if dst_shard is not None:
        n = dst_shard.n
        d_dst_loc = g_dst.d // n
        if src_shard is not None:
            d_src_loc = g_src.d // n
            if g_src.d != g_dst.d:
                idx = np.floor(np.arange(d_dst_loc)
                               * (g_src.d / g_dst.d)).astype(np.int64)
                planes = jnp.take(x[1:d_src_loc + 1], idx, axis=0)
                x = jnp.pad(planes, ((1, 1), (0, 0), (0, 0)))
        else:
            start = jax.lax.axis_index(dst_shard.axis) * d_dst_loc
            j_glob = start + jnp.arange(d_dst_loc)
            idx = jnp.minimum(
                jnp.floor(j_glob * (g_src.d / g_dst.d)).astype(jnp.int32),
                g_src.d - 1)
            planes = jnp.take(x[1:g_src.d + 1], idx, axis=0)
            x = jnp.pad(planes, ((1, 1), (0, 0), (0, 0)))
    elif g_src.d != g_dst.d:
        idx = np.minimum(np.floor(
            np.arange(g_dst.d) * (g_src.d / g_dst.d)).astype(np.int64),
            g_src.d - 1)
        planes = jnp.take(x[1:g_src.d + 1], idx, axis=0)
        x = jnp.pad(planes, ((1, 1), (0, 0), (0, 0)))
    if (g_src.h, g_src.w) != (g_dst.h, g_dst.w) or g_src.npl != g_dst.npl:
        sel = _lane_selection(g_src, g_dst, "nearest", x.dtype)
        x = jnp.einsum("dcn,nm->dcm", x, sel, precision=_prec(x.dtype))
    return x


def _lane_select(x, g_src, g_dst, mapping):
    sel = _lane_selection(g_src, g_dst, mapping, x.dtype)
    return jnp.einsum("dcn,nm->dcm", x, sel, precision=_prec(x.dtype))


class _FlatConvNormAct(nn.Module):
    """ConvNormAct on the flat layout: k=3 via the Pallas streaming kernel
    (1x1 as a flat einsum), GroupNorm(1) from exact masked moments, then
    activation. Parameter tree identical to ConvNormAct
    (``<name>/conv/{kernel,bias}`` [+ ``/norm/{scale,bias}``]).

    ``g_half``: stride-2 mode — the conv runs at full resolution (the
    streaming kernel is stride-1) and the output is decimated exactly
    (odd-flat-plane slice + 0/1 lane-selection einsum, phase (2i, 2j));
    GroupNorm stats are computed on the decimated volume, matching the
    strided ConvNormAct in exact arithmetic.

    ``pending`` (call kwarg): the previous chain conv's deferred
    (eff_scale, eff_shift, act) — fused into this kernel's input
    prologue (k=3, single input only). ``defer=True``: return
    ``(y_raw, (eff_scale, eff_shift, act))`` instead of materializing
    this conv's own norm+activation — the caller threads it into the
    next conv in the chain, saving one full read+write of the volume
    (XLA cannot fuse elementwise producers into a pallas_call input).
    """
    features: int
    g: object  # FlatGeom of the INPUT volume
    kernel_size: int = 3
    activation: Union[str, Callable, None] = "elu"
    use_snn: bool = False
    g_half: object = None

    def _deferrable(self):
        """Defer/prologue legal only for kernel activations."""
        return (self.activation is None
                or self.activation in ("elu", "selu", "relu", "none"))

    @nn.compact
    def __call__(self, x, pending=None, defer=False, residual=None,
                 shard=None, shard_out=None, kperm=None):
        from ..kernels.conv3d_flat import conv3_flat
        from ..ops.flatvol import flat_geom
        from .hnosegxs import _ConvParams
        snn = self.use_snn and is_selu(self.activation)
        parts = x if isinstance(x, (tuple, list)) else (x,)
        cin = sum(t.shape[1] for t in parts)
        kernel, bias = _ConvParams(self.features, cin, self.kernel_size,
                                   snn, name="conv")()
        if kperm is not None and self.kernel_size == 3:
            # permuted plane-major axis (sharded flat path): the DHWIO
            # kernel's spatial axes follow the volume permutation
            kernel = jnp.transpose(kernel, kperm)
        assert pending is None or (self.kernel_size == 3
                                   and len(parts) == 1)
        assert not defer or self._deferrable()
        assert residual is None or (self.kernel_size == 3
                                    and pending is None
                                    and self.g_half is None)
        # shard: FlatShardCtx when the INPUT volume is depth-sharded
        # (self.g stays the GLOBAL geometry; kernels run on the local
        # one). shard_out: shard state AFTER the stride-2 decimation —
        # None there means "gather and decimate replicated" (the next
        # level is not shardable).
        assert shard_out is None or (shard is not None
                                     and self.g_half is not None)
        res_pack = None
        kstats = None
        if self.kernel_size == 1:
            mat = kernel.reshape(cin, self.features)
            # virtual concat: per-part einsums, summed
            y = flat_concat_mix(parts, mat)
            y = y + bias.astype(y.dtype)[None, :, None]
        else:
            # stats fused in-kernel when a same-geometry GroupNorm
            # follows (the decimated case must compute stats on the
            # decimated volume — reference semantics)
            want_stats = not self.use_snn and self.g_half is None
            if shard is not None:
                xh = tuple(shard.halo(t) for t in parts)
                xin = xh if len(xh) > 1 else xh[0]
                g_k, halo, keep = (flat_geom(self.g.d // shard.n, self.g.h,
                                             self.g.w), True, shard.keep())
            else:
                xin = x if len(parts) > 1 else parts[0]
                g_k, halo, keep = self.g, False, None
            out = conv3_flat(xin,
                             kernel.astype(_isl(parts[0].dtype)),
                             bias.astype(_isl(parts[0].dtype)), g_k,
                             prologue=(None if pending is None
                                       else pending[:2]),
                             prologue_act=(None if pending is None
                                           else pending[2]),
                             emit_stats=want_stats,
                             residual=residual, halo=halo, halo_keep=keep)
            if residual is not None and want_stats:
                y, r_raw, kstats, rstats = out
                res_pack = (r_raw, rstats)
            elif residual is not None:
                y, r_raw = out
                res_pack = (r_raw, None)
            elif want_stats:
                y, kstats = out
            else:
                y = out
        g_out, y_shard = self.g, shard
        if self.g_half is not None:
            gh = self.g_half
            if shard is not None and shard_out is None:
                # next level not shardable: gather the full-res conv
                # output and decimate replicated
                y = shard.gather_planes(y)
            # strided output i2 = full-res output at interior plane 2*i2,
            # i.e. flat plane 2*i2 + 1: leading-dim split (free) + a unit
            # slice beat a strided major slice. Shard-local slicing is
            # the SAME pattern (the schedule guarantees an even local
            # plane count, so local interior parity == global parity).
            gh_dec = gh if shard_out is None else flat_geom(
                gh.d // shard_out.n, gh.h, gh.w)
            planes = y[:2 * gh_dec.d].reshape(gh_dec.d, 2, y.shape[1],
                                              y.shape[2])[:, 1]
            planes = jnp.pad(planes, ((1, 1), (0, 0), (0, 0)))
            y = _lane_select(planes, self.g, gh, "decimate2")
            g_out, y_shard = gh, shard_out
        act_name = self.activation if isinstance(self.activation, str) \
            else None
        gnkw = {}
        if y_shard is not None:
            gnkw = dict(g_local=flat_geom(g_out.d // y_shard.n, g_out.h,
                                          g_out.w),
                        psum_axis=y_shard.axis)
        if not self.use_snn:
            scale, gbias = _GNParams(self.features, name="norm")()
            stats = (kstats if (self.kernel_size != 1
                                and self.g_half is None) else None)
            if defer:
                eff = _flat_gn_eff(y, g_out, scale, gbias, stats=stats,
                                   **gnkw)
                main = (y, (eff[0], eff[1], act_name))
            else:
                main = _flat_gn_act(y, g_out, scale, gbias,
                                    self.activation, stats=stats, **gnkw)
        elif defer:  # snn: no norm — defer the bare activation
            one = jnp.ones((self.features,), y.dtype)
            zero = jnp.zeros((self.features,), y.dtype)
            main = (y, (one, zero, act_name))
        else:
            act = get_activation(self.activation)
            main = act(y) if act is not None else y
        if residual is not None:
            return main, res_pack
        return main


class _FlatResidualTap(nn.Module):
    """Fused parallel 1x1 residual branch of a V-Net section (reference
    ``nets/architectures.py:60-74``: conv chain + parallel 1x1
    ConvNormAct on the section input, summed).

    Parameter tree identical to a kernel_size=1 ``_FlatConvNormAct``
    (``<name>/conv/{kernel,bias}`` [+ ``<name>/norm/{scale,bias}``]) so
    checkpoint paths are stable — but the 1x1 conv itself executes inside
    the sibling chain conv's Pallas kernel (``conv3_flat(residual=...)``),
    which already holds the section input in VMEM: the residual branch's
    own HBM read of the input disappears. This module supplies the tap
    weights (``weights()``) and applies the branch's GroupNorm+activation
    epilogue to the kernel-emitted tap (``epilogue()``)."""
    features: int
    cin: int
    g: object
    activation: Union[str, Callable, None] = "elu"
    use_snn: bool = False

    def setup(self):
        from .hnosegxs import _ConvParams
        snn = self.use_snn and is_selu(self.activation)
        self._conv = _ConvParams(self.features, self.cin, 1, snn,
                                 name="conv")
        if not self.use_snn:
            self._norm = _GNParams(self.features, name="norm")

    def weights(self):
        kernel, bias = self._conv()
        mat = kernel.reshape(self.cin, self.features)
        return mat.T, bias

    def epilogue(self, r_raw, rstats, shard=None):
        if not self.use_snn:
            from ..ops.flatvol import flat_geom
            scale, gbias = self._norm()
            gnkw = {}
            if shard is not None:
                gnkw = dict(g_local=flat_geom(self.g.d // shard.n,
                                              self.g.h, self.g.w),
                            psum_axis=shard.axis)
            return _flat_gn_act(r_raw, self.g, scale, gbias,
                                self.activation, stats=rstats, **gnkw)
        act = get_activation(self.activation)
        return act(r_raw) if act is not None else r_raw


class _FlatConvTransposeNormAct(nn.Module):
    """ConvTransposeNormAct on the flat layout: zero-interleave to the
    doubled geometry (plane interleave + 0/1 lane selection), then the
    stride-1 streaming kernel with the spatially flipped kernel — exactly
    torch's stride-2/padding-1/output-padding-1 transposed conv (the flat
    borders supply the conv padding). Parameter tree identical to
    ConvTransposeNormAct."""
    features: int
    g: object      # input FlatGeom (n)
    g2: object     # output FlatGeom (2n)
    activation: Union[str, Callable, None] = "elu"

    @nn.compact
    def __call__(self, x, shard=None, kperm=None):
        from ..kernels.conv3d_flat import conv3_flat
        from ..ops import initializers as inits
        snn = is_selu(self.activation)
        cin = x.shape[1]
        k = (3, 3, 3)
        fan_in = self.features * 27  # torch ConvTranspose fan-in
        w_init = (inits.kaiming_normal_linear(fan_in) if snn
                  else inits.kaiming_uniform_a5(fan_in))
        # params under <name>/conv/{kernel,bias} like ConvTransposeNormAct
        kernel, bias = _ConvTParams(self.features, cin, w_init, snn,
                                    name="conv")()
        if kperm is not None:
            kernel = jnp.transpose(kernel, kperm)  # permuted major axis

        # lane-interleave on the HALF-depth volume (half the einsum). The
        # depth doubling then runs as ONE stride-1 conv on the HALF-depth
        # grid with DOUBLED output channels: even output planes o=2j only
        # receive the center depth tap on x[j]; odd planes o=2j+1 the two
        # outer taps on x[j], x[j+1] — packed as channel groups of a
        # (3,3,3,ci,2co) kernel with structural zeros. Half the grid
        # steps and ~10x less padded MXU work than convolving the
        # explicit zero-dilated volume.
        #
        # Depth sharding (``shard``): the conv runs on the SOURCE-plane
        # grid, so one exchanged source halo plane per side is exactly
        # the stencil's need; the reassembled 2x depth planes stay a
        # contiguous local run (global planes 2J, 2J+1 of local source
        # J), i.e. the doubled level's natural sharding.
        g, g2 = self.g, self.g2
        from ..ops.flatvol import flat_geom
        if shard is not None:
            x = shard.halo(x)           # borders <- neighbor source planes
        up = _lane_select(x, g, g2, "interleave2")   # (Dp_src, C, Npl2)
        flipped = jnp.flip(kernel, axis=(0, 1, 2))
        co = self.features
        k2x = jnp.zeros((3, 3, 3, cin, 2 * co), flipped.dtype)
        k2x = k2x.at[1, :, :, :, :co].set(flipped[1])
        k2x = k2x.at[1, :, :, :, co:].set(flipped[0])
        k2x = k2x.at[2, :, :, :, co:].set(flipped[2])
        d_loc = g.d if shard is None else g.d // shard.n
        g_mid = flat_geom(d_loc, g2.h, g2.w)
        bias2 = jnp.concatenate([bias, bias])
        y2 = conv3_flat(up, k2x.astype(_isl(x.dtype)),
                        bias2.astype(_isl(x.dtype)),
                        g_mid, emit_stats=not snn,
                        halo=shard is not None,
                        halo_keep=None if shard is None else shard.keep())
        if not snn:
            y2, kstats = y2   # (2, 2co) sums == reassembled-volume sums
        planes = y2[1:d_loc + 1].reshape(d_loc, 2, co, g2.npl)
        y = jnp.pad(planes.reshape(2 * d_loc, co, g2.npl),
                    ((1, 1), (0, 0), (0, 0)))
        if not snn:
            scale, gbias = _GNParams(self.features, name="norm")()
            gnkw = {}
            if shard is not None:
                gnkw = dict(g_local=flat_geom(2 * d_loc, g2.h, g2.w),
                            psum_axis=shard.axis)
            return _flat_gn_act(y, g2, scale, gbias, self.activation,
                                stats=kstats, **gnkw)
        act = get_activation(self.activation)
        return act(y) if act is not None else y


class _FlatDSHead(nn.Module):
    """Deep-supervision head on the flat layout: project each right-leg
    tensor at its own resolution (virtual concat), nearest-upsample the
    ``features``-channel results, sum, bias, GroupNorm, activation —
    ConcatConvNormAct's exact parameter tree (``conv_ds/conv`` [+
    ``/norm``]) and project-then-upsample semantics."""
    features: int
    fan_in: int
    activation: Union[str, Callable, None]
    use_snn: bool
    g_dst: object

    @nn.compact
    def __call__(self, legs, shard_dst=None):
        from ..ops.flatvol import flat_geom
        from .hnosegxs import _ConvParams
        snn = self.use_snn and is_selu(self.activation)
        kernel, bias = _ConvParams(self.features, self.fan_in, 1, snn,
                                   name="conv")()
        mat = kernel.reshape(self.fan_in, self.features)
        y = None
        off = 0
        for leg in legs:
            t, g_src = leg[0], leg[1]
            src_shard = leg[2] if len(leg) > 2 else None
            c = t.shape[1]
            part = packed_high_dcn_mix(t, mat[off:off + c])
            if g_src != self.g_dst or (shard_dst is not None
                                       and src_shard is None):
                part = _flat_nearest_upsample(part, g_src, self.g_dst,
                                              src_shard=src_shard,
                                              dst_shard=shard_dst)
            y = part if y is None else y + part
            off += c
        assert off == self.fan_in
        y = y + bias.astype(y.dtype)[None, :, None]
        gnkw = {}
        if shard_dst is not None:
            gnkw = dict(g_local=flat_geom(self.g_dst.d // shard_dst.n,
                                          self.g_dst.h, self.g_dst.w),
                        psum_axis=shard_dst.axis)
        if not self.use_snn:
            scale, gbias = _GNParams(self.features, name="norm")()
            return _flat_gn_act(y, self.g_dst, scale, gbias,
                                self.activation, **gnkw)
        act = get_activation(self.activation)
        return act(y) if act is not None else y


class _ConvTParams(nn.Module):
    """Param-only holder matching ConvTranspose's tree/init (kernel shape
    k + (in, out), torch transpose fan-in = out * prod(k))."""
    features: int
    in_features: int
    w_init: Callable
    snn_init: bool

    @nn.compact
    def __call__(self):
        from ..ops import initializers as inits
        kernel = self.param("kernel", self.w_init,
                            (3, 3, 3, self.in_features, self.features))
        fan_in = self.features * 27
        b_init = (inits.snn_bias() if self.snn_init
                  else inits.torch_conv_bias(fan_in))
        bias = self.param("bias", b_init, (self.features,))
        return kernel, bias


class _VNetConvIn(nn.Module):
    """conv_in (k=2/s=2) via the fused Pallas kernel, reading the raw
    channel-first input, with ConvNormAct's exact parameter tree
    (``conv_in/conv/{kernel,bias}`` [+ ``conv_in/norm/{scale,bias}``]).
    The kernel fuses SELU when use_snn; otherwise GroupNorm + activation
    run in XLA on the kernel output, matching ConvNormAct semantics.
    ``emit_flat``: return ``(flat (Dp, F, Npl), FlatGeom)`` instead of
    channels-last (the V-Net flat path's entry)."""
    features: int
    in_features: int
    activation: Union[str, Callable, None]
    use_snn: bool
    emit_flat: bool = False

    @nn.compact
    def __call__(self, x_cf, kperm=None):
        from ..kernels.conv_in import conv_in_s2d
        from .hnosegxs import _ConvParams
        snn = self.use_snn and is_selu(self.activation)
        kernel, bias = _ConvParams(self.features, self.in_features, 2,
                                   snn, name="conv")()
        if kperm is not None:
            # sharded flat path with a permuted plane-major axis: the
            # input volume is permuted once, the (2,2,2,C,F) kernel's
            # spatial axes follow (parallel/flat_sharded.FlatShardCtx)
            kernel = jnp.transpose(kernel, kperm)
        if self.emit_flat:
            from ..ops.flatvol import flat_geom
            y = conv_in_s2d(x_cf, kernel.astype(_isl(x_cf.dtype)),
                            bias.astype(_isl(x_cf.dtype)), channels_middle=True,
                            apply_selu=False)
            y = jnp.transpose(y[0], (0, 2, 1, 3))      # (D2, F, H2, W2)
            g = flat_geom(y.shape[0], y.shape[2], y.shape[3])
            y = jnp.pad(y, ((1, 1), (0, 0), (1, 1), (1, 1)))
            y = y.reshape(g.dp, self.features, g.np)
            y = jnp.pad(y, ((0, 0), (0, 0), (0, g.npl - g.np)))
            if not self.use_snn:
                scale, gbias = _GNParams(self.features, name="norm")()
                y = _flat_gn_act(y, g, scale, gbias, self.activation)
            else:
                act = get_activation(self.activation)
                if act is not None:
                    y = act(y)
            return y, g
        y = conv_in_s2d(x_cf, kernel.astype(_isl(x_cf.dtype)),
                        bias.astype(_isl(x_cf.dtype)), apply_selu=snn)
        if not self.use_snn:
            y = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(y)
        if not snn:
            act = get_activation(self.activation)
            if act is not None:
                y = act(y)
        return y


class VNetDS(nn.Module):
    """V-Net with deep supervision (reference
    ``nets/architectures.py:26-253``).

    ``num_blocks`` describes the encoding path (e.g. [1, 2, 3, 3, 3]); the
    decoding path mirrors it without the last entry. ``right_leg_indexes``
    selects decoder outputs for deep supervision; all are nearest-upsampled
    to the largest, concatenated, and reduced by a 1x1 conv_ds.
    """
    in_channels: int
    out_channels: int
    base_num_filters: int
    num_blocks: Sequence[int]
    use_resize: bool = True
    right_leg_indexes: Optional[Sequence[int]] = None
    kernel_size: Union[int, Sequence[int]] = 3
    activation: Union[str, Callable, None] = "elu"
    use_snn: bool = False
    output_activation: Union[str, Callable, None] = "softmax"
    use_residual: bool = True
    ndim: int = 5
    channel_first_io: bool = True
    compute_dtype: str = "float32"
    use_pallas: bool = False
    # depth-axis spatial sharding of the flat path: (mesh_axis_name, n).
    # Set by runtime/run.py under [parallel] n_spatial > 1 (when
    # flat_vnet_shardable says the shapes support it); the model must
    # then be applied INSIDE parallel/flat_sharded.make_flat_sharded_apply
    # — x is the shard's local depth slab there.
    spatial_shard: Optional[Tuple[str, int]] = None

    def _use_conv_in_kernel(self, x_cf):
        """Fused conv_in kernel: 3D, batch 1, channel-first input, on a
        real TPU (same gating as HNOSegXS)."""
        return (self.use_pallas and self.use_resize and self.ndim == 5
                and self.channel_first_io and x_cf.shape[0] == 1
                and jax.default_backend() == "tpu")

    def _use_flat(self, x_cf):
        """Whole-network flat-layout execution (Pallas streaming convs,
        exact masked GroupNorm, selection-matrix down/up sampling):
        3D, batch 1, channel-first IO, k=3 convs, on a real TPU. The
        kernel_size gate matters: the flat path hardcodes 3x3x3 stencils,
        so other sizes must serve the module path (identical params)."""
        return (self.use_pallas and self.ndim == 5
                and self.kernel_size == 3
                and self.channel_first_io and x_cf.shape[0] == 1
                and jax.default_backend() == "tpu")

    def _flat_forward(self, x, in_dtype):
        from ..ops.flatvol import flat_geom, from_flat, to_flat

        # optional spatial sharding: inside a shard_map
        # (parallel/flat_sharded.py) x arrives REPLICATED (the entry
        # conv's padding-1 windows straddle any split and the raw
        # in_channels volume is the network's smallest tensor); the
        # entry runs replicated, then each device slices its local plane
        # slab. Geometries stay GLOBAL; the static per-level schedule
        # decides which levels run sharded (halo'd kernels + psum'd
        # GroupNorm) vs replicated (deep levels whose plane counts stop
        # dividing). ``ctx.dim`` picks which image axis is plane-major
        # (the k=3 stencil is isotropic; kernels permute along).
        ctx = kperm = None
        if self.spatial_shard is not None:
            from ..parallel.flat_sharded import FlatShardCtx, shard_schedule
            ctx = FlatShardCtx(*self.spatial_shard)
            if ctx.dim:
                x = jnp.transpose(x, (0, 1) + tuple(2 + k
                                                    for k in ctx.sperm))
                kperm = ctx.kperm

        right_leg_indexes = self.right_leg_indexes
        if right_leg_indexes is None:
            right_leg_indexes = [0]
        image_size = x.shape[2:]
        x = x.astype(self.compute_dtype)
        base = self.base_num_filters

        if self.use_resize:
            x, g = _VNetConvIn(base, x.shape[1], self.activation,
                               self.use_snn, emit_flat=True,
                               name="conv_in")(x, kperm=kperm)
        else:
            g = flat_geom(*x.shape[2:])
            x = to_flat(x[0], g)

        num_sections = len(self.num_blocks)
        if ctx is not None:
            scheds = shard_schedule(g.d, num_sections, ctx.n)
            if not scheds[0]:
                raise ValueError(
                    f"spatial_shard: entry depth {g.d} is not shardable "
                    f"over {ctx.n} devices (see flat_vnet_shardable)")
            if any(int(b) < 1 for b in self.num_blocks):
                raise ValueError("spatial_shard requires every section "
                                 "to have >= 1 conv block")
            lvl = [ctx if s else None for s in scheds]
            x = ctx.local_slab(x, g.d // ctx.n)  # replicated -> local
        else:
            lvl = [None] * num_sections

        def conv(features, name, geom, kernel_size=3, g_half=None):
            return functools.partial(
                _FlatConvNormAct(features, geom, kernel_size=kernel_size,
                                 activation=self.activation,
                                 use_snn=self.use_snn, g_half=g_half,
                                 name=name), kperm=kperm)

        act_ok = (self.activation is None
                  or self.activation in ("elu", "selu", "relu", "none"))

        def conv_chain(x0, filters, names, geom, res_name=None,
                       shard=None):
            """k=3 conv chain with deferred norm+act between links: each
            non-final conv hands its (eff_scale, eff_shift, act) to the
            next kernel's prologue — no intermediate elementwise pass.
            The first element of ``names``' input may be a (pair).

            ``res_name``: fuse the section's parallel 1x1 residual branch
            into the FIRST chain conv's kernel (which already reads the
            section input) and return ``(chain_out, residual_out)``."""
            xc, pend = x0, None
            tap = res_out = None
            if res_name is not None:
                parts0 = x0 if isinstance(x0, (tuple, list)) else (x0,)
                tap = _FlatResidualTap(
                    filters, sum(t.shape[1] for t in parts0), geom,
                    activation=self.activation, use_snn=self.use_snn,
                    name=res_name)
            if not names:
                # degenerate 0-block section: no chain conv for the tap
                # to ride and nothing to virtually concat into, so
                # materialize the pair and (with residual) run the 1x1
                # tap as a precision-correct XLA mix (GN masks the dirty
                # borders via stats=None)
                from ..ops.spectral import flat_concat_mix
                assert shard is None  # gated in the schedule check above
                if isinstance(xc, (tuple, list)):
                    xc = jnp.concatenate(xc, axis=1)
                if tap is None:
                    return xc
                mat, rb = tap.weights()
                r_raw = (flat_concat_mix(parts0, mat.T)
                         + rb.astype(xc.dtype)[None, :, None])
                return xc, tap.epilogue(r_raw, None)
            for idx, name in enumerate(names):
                d = act_ok and idx != len(names) - 1
                if idx == 0 and tap is not None:
                    out, res_pack = conv(filters, name, geom)(
                        xc, pending=pend, defer=d, residual=tap.weights(),
                        shard=shard)
                    res_out = tap.epilogue(*res_pack, shard=shard)
                else:
                    out = conv(filters, name, geom)(xc, pending=pend,
                                                    defer=d, shard=shard)
                xc, pend = out if d else (out, None)
            return (xc, res_out) if res_name is not None else xc

        encode_tensors, encode_geoms = {}, {}
        right_leg, right_leg_ref, leg_geoms, leg_shards = [], {}, {}, {}

        for i in range(num_sections):
            filters = base * (2 ** i)
            names = [f"encode_{i}_conv_{j}"
                     for j in range(self.num_blocks[i])]
            if self.use_residual:
                x, r = conv_chain(x, filters, names, g,
                                  res_name=f"encode_{i}_residual",
                                  shard=lvl[i])
                x = x + r
            else:
                x = conv_chain(x, filters, names, g, shard=lvl[i])
            if i != num_sections - 1:
                encode_tensors[i], encode_geoms[i] = x, g
                g_half = flat_geom((g.d - 1) // 2 + 1, (g.h - 1) // 2 + 1,
                                   (g.w - 1) // 2 + 1)
                x = conv(filters, f"encode_{i}_down", g, g_half=g_half)(
                    x, shard=lvl[i], shard_out=lvl[i + 1])
                g = g_half
            elif i in right_leg_indexes:
                right_leg.append((i, x))
                right_leg_ref[i] = x
                leg_geoms[i] = g
                leg_shards[i] = lvl[i]

        for i in reversed(range(num_sections - 1)):
            filters = base * (2 ** i)
            g2 = flat_geom(2 * g.d, 2 * g.h, 2 * g.w)
            x = _FlatConvTransposeNormAct(filters, g, g2,
                                          activation=self.activation,
                                          name=f"decode_{i}_up")(
                x, shard=lvl[i + 1], kperm=kperm)
            g = g2
            up_shard = lvl[i + 1]  # sharded up-conv yields a sharded 2x
            ge = encode_geoms[i]
            if (g.d, g.h, g.w) != (ge.d, ge.h, ge.w):
                x = _flat_crop(x, g, ge, shard=up_shard)
                g = ge
            if lvl[i] is not None and up_shard is None:
                # back to a sharded level from a replicated one: every
                # device already holds the full tensor — local slab, no
                # communication
                x = lvl[i].local_slab(x, g.d // lvl[i].n)
            # virtual concat: the first conv and the fused residual 1x1
            # read (up, skip) directly — the concatenated tensor never
            # exists, and the residual tap rides the first conv's kernel
            pair = (x, encode_tensors[i])
            names = [f"decode_{i}_conv_{j}"
                     for j in range(self.num_blocks[i])]
            if self.use_residual:
                x, r = conv_chain(pair, filters, names, g,
                                  res_name=f"decode_{i}_residual",
                                  shard=lvl[i])
                x = x + r
            else:
                x = conv_chain(pair, filters, names, g, shard=lvl[i])
            if i in right_leg_indexes:
                right_leg.append((i, x))
                right_leg_ref[i] = x
                leg_geoms[i] = g
                leg_shards[i] = lvl[i]

        if len(right_leg) == 1:
            x = right_leg_ref[0]
            g0 = leg_geoms[0]
        else:
            g0 = leg_geoms[0]
            fan_in = sum(t.shape[1] for _, t in right_leg)
            x = _FlatDSHead(self.out_channels, fan_in, self.activation,
                            self.use_snn, g0, name="conv_ds")(
                [(t, leg_geoms[idx], leg_shards[idx])
                 for idx, t in right_leg], shard_dst=lvl[0])

        from .hnosegxs import _Conv1x1Weight
        snn = self.use_snn and is_selu(self.activation)
        kern = _Conv1x1Weight(self.out_channels, x.shape[1], snn,
                              name="conv_out")()
        mat = kern.reshape(x.shape[1], self.out_channels)
        x = packed_high_dcn_mix(x, mat)

        if lvl[0] is not None:
            # the tail volume is down to out_channels — gather it and run
            # the resize/padcrop/softmax replicated (the D resize matmul
            # contracts the global depth axis)
            x = lvl[0].gather_planes(x)

        x = from_flat(x, g0)[None]                 # (1, out, D2, H2, W2)
        done = None
        if self.use_resize and self.output_activation == "softmax":
            from ..kernels.tail_resize import maybe_fused_tail
            done = maybe_fused_tail(x, image_size, in_dtype)
        if done is not None:
            x = done
        else:
            if self.use_resize:
                x = resize_linear(x, image_size, channel_first=True)
            x = spatial_padcrop(x, image_size, channel_first=True)
            x = x.astype(in_dtype)
            x = _apply_output_activation(x, self.output_activation, axis=1)
        if ctx is not None and ctx.dim:
            x = jnp.transpose(x, (0, 1) + tuple(2 + k
                                                for k in ctx.sperm_inv))
        return x

    @nn.compact
    def __call__(self, x):
        assert self.ndim in (4, 5)
        assert isinstance(self.num_blocks, (list, tuple))
        if self.spatial_shard is not None:
            # explicit opt-in (run.py routes it only under a spatial
            # mesh): the flat path is mandatory here — the module path
            # cannot see a local depth slab as a whole volume
            assert (self.ndim == 5 and self.kernel_size == 3
                    and self.channel_first_io and x.shape[0] == 1), (
                "spatial_shard requires the flat path's constraints: "
                "3D, k=3, channel-first, batch 1")
            return self._flat_forward(x, x.dtype)
        if self._use_flat(x):
            return self._flat_forward(x, x.dtype)
        conv_in_kernel = self._use_conv_in_kernel(x)
        if self.channel_first_io and not conv_in_kernel:
            x = _to_channels_last(x)
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype)

        right_leg_indexes = self.right_leg_indexes
        if right_leg_indexes is None:
            right_leg_indexes = [0]
        snn = self.use_snn and is_selu(self.activation)

        def conv(features, kernel_size, name, strides=1):
            return ConvNormAct(features, kernel_size=kernel_size,
                               strides=strides, use_bias=True,
                               activation=self.activation,
                               use_snn=self.use_snn, name=name)

        image_size = x.shape[2:] if conv_in_kernel else x.shape[1:-1]
        num_sections = len(self.num_blocks)
        encode_tensors = {}
        right_leg = []  # (section index, tensor) in insertion order
        right_leg_ref = {}

        if self.use_resize:
            if conv_in_kernel:  # reads channel-first, emits channels-last
                x = _VNetConvIn(self.base_num_filters, x.shape[1],
                                self.activation, self.use_snn,
                                name="conv_in")(x)
            else:
                x = ConvNormAct(self.base_num_filters, kernel_size=2,
                                strides=2, use_bias=True,
                                activation=self.activation,
                                use_snn=self.use_snn, name="conv_in")(x)

        # Encoding
        for i in range(num_sections):
            filters = self.base_num_filters * (2 ** i)
            tmp = x if self.use_residual else None
            for j in range(self.num_blocks[i]):
                x = conv(filters, self.kernel_size,
                         f"encode_{i}_conv_{j}")(x)
            if tmp is not None:
                x = x + conv(filters, 1, f"encode_{i}_residual")(tmp)
            if i != num_sections - 1:
                encode_tensors[i] = x
                x = conv(filters, self.kernel_size, f"encode_{i}_down",
                         strides=2)(x)
            elif i in right_leg_indexes:
                right_leg.append((i, x))
                right_leg_ref[i] = x

        # Decoding
        for i in reversed(range(num_sections - 1)):
            filters = self.base_num_filters * (2 ** i)
            x = ConvTransposeNormAct(filters, kernel_size=self.kernel_size,
                                     use_bias=True,
                                     activation=self.activation,
                                     name=f"decode_{i}_up")(x)
            x = spatial_padcrop(x, encode_tensors[i].shape[1:-1])
            x = jnp.concatenate([x, encode_tensors[i]], axis=-1)
            tmp = x if self.use_residual else None
            for j in range(self.num_blocks[i]):
                x = conv(filters, self.kernel_size,
                         f"decode_{i}_conv_{j}")(x)
            if tmp is not None:
                x = x + conv(filters, 1, f"decode_{i}_residual")(tmp)
            if i in right_leg_indexes:
                right_leg.append((i, x))
                right_leg_ref[i] = x

        # Right leg (deep supervision): nearest-upsample everything to the
        # section-0 tensor and concat (reference
        # ``nets/architectures.py:638-653``), then 1x1 conv_ds.
        if len(right_leg) == 1:
            x = right_leg_ref[0]
        else:
            # project-then-upsample: each leg is 1x1-projected at its own
            # resolution and nearest-upsampled after (exact — the gather
            # commutes with the per-voxel einsum); the reference upsamples
            # the wide legs first (``nets/architectures.py:638-653``)
            ref_size = right_leg_ref[0].shape[1:-1]
            x = ConcatConvNormAct(self.out_channels, use_bias=True,
                                  activation=self.activation,
                                  use_snn=self.use_snn,
                                  upsample_to=ref_size,
                                  name="conv_ds")(
                tuple(t for _, t in right_leg))

        x = Conv(self.out_channels, 1, use_bias=False, snn_init=snn,
                 name="conv_out")(x)
        x = _channel_first_tail(x, image_size, self.use_resize, in_dtype,
                                self.output_activation,
                                pallas_ok=self.use_pallas)
        if not self.channel_first_io:
            x = _to_channels_last(x)
        return x
