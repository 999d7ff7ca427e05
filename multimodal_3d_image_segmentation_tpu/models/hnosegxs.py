"""HNOSeg-XS: extremely small Hartley neural operator for segmentation
(IEEE-TMI 2025). Re-design of the reference ``nets/hnosegxs.py:20-494``.

Architecture (per reference): optional learnable 2x downsampling -> 1x1 conv
-> a tower of HNO-XS blocks with U-Net-style skips across blocks (first half
encode, second half decode, median excluded) -> optional deep-supervision
concat -> trilinear upsample -> 1x1 conv -> softmax.

Each HNO-XS block performs ONE forward Hartley transform cropped to the kept
modes, runs n_XS frequency-resident channel-mixing convolutions with
identity skips and SELU entirely on the packed spectrum, and ONE inverse
transform — the source of its speed. On TPU the transform pair is the pruned
matmul chain of :mod:`..ops.spectral`, and the frequency-resident chain is a
dense (o, i) einsum stack that XLA fuses onto the MXU (the whole packed
spectrum for the flagship config is ~1.4 MB and lives in VMEM).

Reference config (``experiments/config_files/config_hnoseg_xs.ini:46-51``):
filters=24, num_transform_blocks=[3]*8, num_modes=(10,14,14) -> 28,248
parameters, asserted in tests.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import get_activation, is_selu
from ..ops.convs import (ConcatConvNormAct, Conv, ConvNormAct,
                         _SplitKernelConv1x1)
from ..ops.flatvol import FlatGeom, flat_geom, from_flat, to_flat
from ..ops.operators import HartleyOperator
from ..ops.padcrop import spatial_padcrop
from ..ops.resize import resize_linear
from ..ops.spectral import (_isl, clip_modes, dht_crop, dht_crop_flat,
                            dht_pad_inverse, dht_pad_inverse_flat,
                            flat_concat_mix, normalize_modes)

__all__ = ["HNOSegXS", "HNOXSBlock"]


class _OpWeight(nn.Module):
    """Param-only holder mirroring the layout of a HartleyOperator weight
    (used by the fused Pallas path so parameter paths stay identical to the
    module path: ``conv_blocks_{j}/op/weight``)."""
    out_channels: int
    in_channels: int
    snn_init: bool

    @nn.compact
    def __call__(self):
        from ..ops import initializers as inits
        init = (inits.kaiming_normal_linear(self.in_channels)
                if self.snn_init
                else inits.kaiming_uniform_a5(self.in_channels))
        return self.param("weight", init,
                          (self.out_channels, self.in_channels))


class _OpScope(nn.Module):
    out_channels: int
    in_channels: int
    snn_init: bool

    @nn.compact
    def __call__(self):
        return _OpWeight(self.out_channels, self.in_channels,
                         self.snn_init, name="op")()


class _ConvParams(nn.Module):
    """Param-only holder with ConvNormAct's conv layout (kernel+bias),
    used by the fused conv_in kernel so parameter paths stay identical to
    the ConvNormAct path: ``conv_in/conv/{kernel,bias}``."""
    features: int
    in_features: int
    kernel_size: int
    snn_init: bool

    @nn.compact
    def __call__(self):
        from ..ops import initializers as inits
        k = (self.kernel_size,) * 3
        fan_in = self.in_features * int(np.prod(k))
        w_init = (inits.kaiming_normal_linear(fan_in) if self.snn_init
                  else inits.kaiming_uniform_a5(fan_in))
        kernel = self.param("kernel", w_init,
                            k + (self.in_features, self.features))
        b_init = (inits.snn_bias() if self.snn_init
                  else inits.torch_conv_bias(fan_in))
        bias = self.param("bias", b_init, (self.features,))
        return kernel, bias


class _ConvInScope(nn.Module):
    features: int
    in_features: int
    snn_init: bool

    @nn.compact
    def __call__(self):
        return _ConvParams(self.features, self.in_features, 2,
                           self.snn_init, name="conv")()


class _Conv1x1Weight(nn.Module):
    """Param-only holder matching _SplitKernelConv1x1's kernel (no bias);
    used by the flat-layout path so parameter paths stay identical."""
    features: int
    fan_in: int
    snn_init: bool

    @nn.compact
    def __call__(self):
        from ..ops import initializers as inits
        init = (inits.kaiming_normal_linear(self.fan_in) if self.snn_init
                else inits.kaiming_uniform_a5(self.fan_in))
        return self.param("kernel", init,
                          (1, 1, 1, self.fan_in, self.features))


class _FlatConcatConv(nn.Module):
    """Virtual-concat 1x1 conv + bias + SELU on flat (Dp, C, Npl) tensors,
    with ConcatConvNormAct's exact parameter tree
    (``<name>/conv/{kernel,bias}``). Borders become dirty (bias + SELU) —
    downstream flat consumers remove them exactly."""
    features: int
    fan_in: int
    snn_init: bool = True
    apply_act: bool = True

    @nn.compact
    def __call__(self, inputs):
        assert sum(t.shape[1] for t in inputs) == self.fan_in
        kernel, bias = _ConvParams(self.features, self.fan_in, 1,
                                   self.snn_init, name="conv")()
        mat = kernel.reshape(self.fan_in, self.features)
        y = flat_concat_mix(inputs, mat)
        y = y + bias.astype(y.dtype)[None, :, None]
        if self.apply_act:
            y = jax.nn.selu(y)
        return y


class _FreqResidentConv(nn.Module):
    """One frequency-domain convolution with identity skip + activation
    (reference ``nets/hnosegxs.py:282-329``). Operates on the packed
    spectrum; with shared weights this is a 1x1 channel-mixing conv."""
    in_channels: int
    out_channels: int
    num_modes: Union[int, Sequence[int]]
    weights_type: str = "shared"
    activation: Union[str, Callable, None] = "selu"
    use_conv_branch: bool = False
    snn_init: bool = False

    @nn.compact
    def __call__(self, x):
        x1 = HartleyOperator(
            self.in_channels, self.out_channels, self.num_modes,
            use_bias=False, weights_type=self.weights_type,
            use_transform=False, snn_init=self.snn_init, name="op")(x)
        if self.use_conv_branch:
            x2 = Conv(self.out_channels, 1, use_bias=False,
                      snn_init=self.snn_init, name="conv_branch")(x)
            x1 = x1 + x2
        x1 = x1 + x  # identity skip
        if not is_selu(self.activation):
            x1 = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                              name="normalization")(x1)
        act = get_activation(self.activation)
        if act is not None:  # This activation is crucial
            x1 = act(x1)
        return x1


class HNOXSBlock(nn.Module):
    """HNO-XS block: transform-crop -> n_XS frequency-resident convolutions
    -> pad-inverse -> activation -> block skip (concat+conv or add)
    (reference ``nets/hnosegxs.py:185-279``)."""
    num_convs: int
    in_channels: int
    out_channels: int
    num_modes: Union[int, Sequence[int]]
    weights_type: str = "shared"
    activation: Union[str, Callable, None] = "selu"
    use_conv_branch: bool = False
    use_block_concat: bool = True
    snn_init: bool = False
    use_pallas: bool = False
    flat_geom: Optional[FlatGeom] = None

    def _can_fuse(self):
        """The Pallas fused chain covers the common configuration: shared
        weights, SELU (no normalization), no conv branch."""
        return (self.use_pallas and self.weights_type == "shared"
                and is_selu(self.activation) and not self.use_conv_branch)

    def _flat_call(self, x, skip):
        """Flat-layout (Dp, C, Npl) block: the big grid is touched only by
        the D-stage contractions and the concat einsums — no channels-last
        lane-padding tax (docs/DESIGN.md §3d). Identical parameters and
        (to fp rounding) identical values to the module path."""
        from ..kernels.freq_chain import fused_freq_chain
        g = self.flat_geom
        if self.in_channels != self.out_channels:
            inputs = (x,) if skip is None else (x, skip)
            x = _FlatConcatConv(self.out_channels, self.in_channels,
                                self.snn_init, name="mapping_conv")(inputs)
        else:
            assert skip is None
        tmp = x
        modes = clip_modes(normalize_modes(self.num_modes, 3),
                           (g.d, g.h, g.w))
        y = dht_crop_flat(x, g, modes)
        weights = [_OpScope(self.out_channels, self.out_channels,
                            self.snn_init, name=f"conv_blocks_{i}")()
                   for i in range(self.num_convs)]
        y = fused_freq_chain(y, weights)
        # 'mixed' mode: the freq-resident chain rides fp32 spectra; the
        # volume-scale inverse output drops back to the activation dtype
        # (cast fuses into the last einsum's epilogue)
        x = jax.nn.selu(dht_pad_inverse_flat(y, g)).astype(tmp.dtype)
        if self.use_block_concat:
            x = _FlatConcatConv(self.out_channels, 2 * self.out_channels,
                                self.snn_init, name="conv_concat")((x, tmp))
        else:
            x = x + tmp
        return x

    @nn.compact
    def __call__(self, x, skip=None):
        """``skip`` is the U-Net skip tensor; it is concatenated (virtually)
        with x before the mapping conv, never materialized."""
        if self.flat_geom is not None:
            assert self._can_fuse(), "flat mode requires the fused config"
            return self._flat_call(x, skip)
        if self.in_channels != self.out_channels:
            inputs = (x,) if skip is None else (x, skip)
            x = ConcatConvNormAct(self.out_channels, use_bias=True,
                                  activation=self.activation,
                                  use_snn=is_selu(self.activation),
                                  name="mapping_conv")(inputs)
        else:
            assert skip is None

        tmp = x
        nd = x.ndim - 2
        sizes = x.shape[1:-1]
        modes = clip_modes(normalize_modes(self.num_modes, nd), sizes)

        # TransformCrop: one forward DHT restricted to the kept modes.
        y = dht_crop(x, modes)
        if self._can_fuse():
            from ..kernels.freq_chain import fused_freq_chain
            weights = [_OpScope(self.out_channels, self.out_channels,
                                self.snn_init, name=f"conv_blocks_{i}")()
                       for i in range(self.num_convs)]
            y = fused_freq_chain(y, weights)
        else:
            for i in range(self.num_convs):
                y = _FreqResidentConv(
                    self.out_channels, self.out_channels, self.num_modes,
                    weights_type=self.weights_type,
                    activation=self.activation,
                    use_conv_branch=self.use_conv_branch,
                    snn_init=self.snn_init, name=f"conv_blocks_{i}")(y)
        # PadInverse: one inverse DHT back to the block grid ('mixed'
        # mode: back to the activation dtype, spectra stayed fp32).
        x = dht_pad_inverse(y, sizes).astype(tmp.dtype)

        if not is_selu(self.activation):
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             name="normalization")(x)
        act = get_activation(self.activation)
        if act is not None:
            x = act(x)

        # Block skip AFTER normalization/activation (reference
        # ``nets/hnosegxs.py:270-277``: intensity range of pad_inverse).
        if self.use_block_concat:
            x = ConcatConvNormAct(self.out_channels, use_bias=True,
                                  activation=self.activation,
                                  use_snn=is_selu(self.activation),
                                  name="conv_concat")((x, tmp))
        else:
            x = x + tmp
        return x


class HNOSegXS(nn.Module):
    """HNOSeg-XS architecture (reference ``nets/hnosegxs.py:20-182``).

    Public contract matches the reference: input (B, C, *spatial)
    channel-first, output softmax probabilities (B, out_channels, *spatial).
    """
    in_channels: int
    out_channels: int
    filters: int
    num_transform_blocks: Union[int, Sequence[int]]
    num_modes: Union[int, Sequence[int]]
    weights_type: str = "shared"
    use_resize: bool = True
    use_deep_supervision: bool = False
    use_unet_skip: bool = True
    use_block_concat: bool = True
    activation: Union[str, Callable, None] = "selu"
    output_activation: Union[str, Callable, None] = "softmax"
    ndim: int = 5
    channel_first_io: bool = True
    use_pallas: bool = False
    use_flat: bool = False  # experimental flat-layout block tower
    compute_dtype: str = "float32"
    use_remat: bool = False

    def _use_conv_in_kernel(self, x_cf):
        """The fused conv_in kernel covers the common case: 3D, SELU,
        batch 1, fp32/bf16, running on a real TPU."""
        return (self.use_pallas and self.ndim == 5
                and is_selu(self.activation) and x_cf.shape[0] == 1
                and jax.default_backend() == "tpu")

    def _use_flat_blocks(self, x_cf):
        """Flat-layout (Dp, C, Npl) execution of the whole block tower:
        the channels-last lane-padding tax (~5x memory traffic at C=24,
        docs/DESIGN.md §3d) disappears from every elementwise/einsum pass.
        Covers the flagship configuration; identical parameters, values
        equal to the module path to fp rounding."""
        return (self.use_flat and self.ndim == 5
                and self.channel_first_io and x_cf.shape[0] == 1
                and is_selu(self.activation)
                and self.weights_type == "shared"
                and self.use_block_concat
                and jax.default_backend() == "tpu")

    def _flat_forward(self, x, in_dtype):
        from ..kernels.conv_in import conv_in_s2d

        image_size = x.shape[2:]
        x = x.astype(self.compute_dtype)
        f = self.filters

        if self.use_resize:
            kernel, bias = _ConvInScope(f, x.shape[1], True,
                                        name="conv_in")()
            y = conv_in_s2d(x, kernel.astype(_isl(x.dtype)),
                            bias.astype(_isl(x.dtype)), channels_middle=True)
            y = jnp.transpose(y[0], (0, 2, 1, 3))     # (D2, F, H2, W2)
            g = flat_geom(*[y.shape[0], y.shape[2], y.shape[3]])
            y = jnp.pad(y, ((1, 1), (0, 0), (1, 1), (1, 1)))
            y = y.reshape(g.dp, f, g.np)
            x = jnp.pad(y, ((0, 0), (0, 0), (0, g.npl - g.np)))
        else:
            g = flat_geom(*x.shape[2:])
            x = to_flat(x[0], g)

        x = _FlatConcatConv(f, x.shape[1], True, name="conv1")((x,))

        ntb = self.num_transform_blocks
        if np.isscalar(ntb):
            ntb = [int(ntb)]
        num_blocks = len(ntb)
        ds_tensors = []
        encode_tensors = {}
        if self.use_deep_supervision:
            ds_tensors.append(x)

        block_cls = nn.remat(HNOXSBlock) if self.use_remat else HNOXSBlock
        cur_in = f
        for i, num_convs in enumerate(ntb):
            skip = None
            if self.use_unet_skip and i > num_blocks // 2:
                skip = encode_tensors[num_blocks - 1 - i]
                cur_in = cur_in + skip.shape[1]
            x = block_cls(num_convs, cur_in, f, self.num_modes,
                          weights_type=self.weights_type,
                          activation=self.activation,
                          use_block_concat=self.use_block_concat,
                          snn_init=True, use_pallas=True, flat_geom=g,
                          name=f"layers_{i}")(x, skip)
            cur_in = f
            if self.use_deep_supervision:
                ds_tensors.append(x)
            if self.use_unet_skip and i < num_blocks // 2:
                encode_tensors[i] = x

        feats = tuple(ds_tensors) if ds_tensors else (x,)
        fan_in = sum(t.shape[1] for t in feats)
        kern = _Conv1x1Weight(self.out_channels, fan_in, True,
                              name="conv_out")()
        mat = kern.reshape(fan_in, self.out_channels)
        y = flat_concat_mix(feats, mat)

        # tail: tiny channel count -> unflatten + channel-first resize
        x = from_flat(y, g)[None]                     # (1, out, D2, H2, W2)
        if self.use_resize and self.output_activation == "softmax":
            from ..kernels.tail_resize import maybe_fused_tail
            fused = maybe_fused_tail(x, image_size, in_dtype)
            if fused is not None:
                return fused
        if self.use_resize:
            x = resize_linear(x, image_size, channel_first=True)
        x = spatial_padcrop(x, image_size, channel_first=True)
        x = x.astype(in_dtype)
        if self.output_activation == "softmax":
            x = jax.nn.softmax(x, axis=1)
        else:
            act = get_activation(self.output_activation)
            if act is not None:
                x = act(x)
        return x

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.ndim in (4, 5)
        snn = is_selu(self.activation)
        in_dtype = x.dtype
        if self._use_flat_blocks(x):
            return self._flat_forward(x, in_dtype)

        # Fused Pallas conv_in consumes the *channel-first* input directly
        # (dense HBM layout) and emits the channels-last half-res grid (the
        # trailing relayout from the kernel's native channels-middle layout
        # is fused by XLA into conv1's einsum; measured faster than feeding
        # conv1 channels-middle and transposing in its matmul). The
        # fallback transposes first and uses ConvNormAct. Parameters are
        # identical in all branches (conv_in/conv/{kernel,bias}).
        conv_in_done = False
        if (self.use_resize and self.channel_first_io
                and self._use_conv_in_kernel(x)):
            from ..kernels.conv_in import conv_in_s2d
            image_size = x.shape[2:]  # channel-first original size
            kernel, bias = _ConvInScope(self.filters, x.shape[1],
                                        snn, name="conv_in")()
            # Mixed precision: activations in compute_dtype (params fp32)
            x = x.astype(self.compute_dtype)
            x = conv_in_s2d(x, kernel.astype(_isl(x.dtype)),
                            bias.astype(_isl(x.dtype)))
            conv_in_done = True
        else:
            if self.channel_first_io:
                nd = x.ndim
                x = x.transpose((0,) + tuple(range(2, nd)) + (1,))
            x = x.astype(self.compute_dtype)
            image_size = x.shape[1:-1]

        ntb = self.num_transform_blocks
        if np.isscalar(ntb):
            ntb = [int(ntb)]
        num_blocks = len(ntb)

        ds_tensors = []
        encode_tensors = {}

        if self.use_resize and not conv_in_done:
            x = ConvNormAct(self.filters, kernel_size=2, strides=2,
                            use_bias=True, activation=self.activation,
                            use_snn=snn, name="conv_in")(x)

        x = ConvNormAct(self.filters, use_bias=True,
                        activation=self.activation, use_snn=snn,
                        name="conv1")(x)
        if self.use_deep_supervision:
            ds_tensors.append(x)

        # Rematerialization trades FLOPs for activation memory when
        # training at full resolution (jax.checkpoint per block).
        block_cls = nn.remat(HNOXSBlock) if self.use_remat else HNOXSBlock

        cur_in = self.filters
        for i, num_convs in enumerate(ntb):
            # Decoding: always exclude i == num_blocks // 2 (median /
            # self-input block), reference ``nets/hnosegxs.py:116-128``.
            skip = None
            if self.use_unet_skip and i > num_blocks // 2:
                skip = encode_tensors[num_blocks - 1 - i]
                cur_in = cur_in + skip.shape[-1]

            x = block_cls(num_convs, cur_in, self.filters, self.num_modes,
                           weights_type=self.weights_type,
                           activation=self.activation,
                           use_block_concat=self.use_block_concat,
                           snn_init=snn, use_pallas=self.use_pallas,
                           name=f"layers_{i}")(x, skip)
            cur_in = self.filters

            if self.use_deep_supervision:
                ds_tensors.append(x)
            if self.use_unet_skip and i < num_blocks // 2:
                encode_tensors[i] = x

        # conv_out is a 1x1 (pointwise, linear, no bias) conv and the
        # resize is linear and per-channel, so they commute exactly; apply
        # conv_out on the (virtual) deep-supervision concat at the block
        # grid BEFORE upsampling so the resize moves out_channels instead
        # of the full feature stack. Numerically identical to the
        # reference order (``nets/hnosegxs.py:171-178``).
        x = _SplitKernelConv1x1(self.out_channels, use_bias=False,
                                snn_init=snn, name="conv_out")(
            tuple(ds_tensors) if ds_tensors else x)

        # Go channel-first while the tensor is still small: the upsample
        # gathers then run with a large minor dim (the few-channel
        # channels-last gather pays ~32x lane padding on TPU), and the
        # channel-first output needs no final transpose.
        nd = x.ndim
        x = x.transpose((0, nd - 1) + tuple(range(1, nd - 1)))
        fused = None
        if (self.use_pallas and self.use_resize
                and self.output_activation == "softmax"):
            from ..kernels.tail_resize import maybe_fused_tail
            fused = maybe_fused_tail(x, image_size, in_dtype)
        if fused is not None:
            x = fused
        else:
            if self.use_resize:
                x = resize_linear(x, image_size, channel_first=True)
            x = spatial_padcrop(x, image_size, channel_first=True)
            x = x.astype(in_dtype)

            if self.output_activation == "softmax":
                x = jax.nn.softmax(x, axis=1)
            else:
                act = get_activation(self.output_activation)
                if act is not None:
                    x = act(x)

        if not self.channel_first_io:
            x = x.transpose((0,) + tuple(range(2, nd)) + (1,))
        return x
