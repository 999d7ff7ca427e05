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

from typing import Callable, Optional, Sequence, Union

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
                        output_activation):
    """Shared output tail: transpose channel-first while small, upsample,
    pad/crop, softmax over axis 1 (see hnosegxs.py for rationale —
    few-channel channels-last gathers pay heavy lane padding on TPU)."""
    x = _to_channel_first(x)
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

    def _tower(self, x, make_block):
        snn = is_selu(self.activation)
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype)
        image_size = x.shape[1:-1]
        tensors = []

        if self.use_resize:
            x = ConvNormAct(self.filters, kernel_size=2, strides=2,
                            use_bias=True, activation=self.activation,
                            use_snn=snn, name="conv_in")(x)

        x = ConvNormAct(self.filters, use_bias=True,
                        activation=self.activation, use_snn=snn,
                        name="conv1")(x)
        if self.use_deep_supervision:
            tensors.append(x)

        cur_in = self.filters
        for i in range(self.num_transform_blocks):
            x = make_block(i, cur_in)(x)
            cur_in = self.filters
            if self.use_deep_supervision:
                tensors.append(x)

        if tensors:
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
                                   self.output_activation)


class NeuralOperatorSeg(_TransSegBase):
    """FNO / FNOSeg / HNOSeg family (reference
    ``nets/architectures.py:356-429``)."""
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

    @nn.compact
    def __call__(self, x):
        assert self.transform_type in ("Fourier", "Hartley")
        assert self.ndim in (4, 5)
        if self.channel_first_io:
            x = _to_channels_last(x)

        def make_block(i, cur_in):
            return NeuralOperatorBlock(
                cur_in, self.filters, self.num_modes, self.transform_type,
                weights_type=self.weights_type, activation=self.activation,
                use_bias_conv_branch=self.use_bias_conv_branch,
                use_block_skip=self.use_block_skip,
                use_block_concat=self.use_block_concat, name=f"layers_{i}")

        x = self._tower(x, make_block)  # returns channel-first
        if not self.channel_first_io:
            x = _to_channels_last(x)
        return x


class HartleyMHASeg(_TransSegBase):
    """HartleyMHA architecture (reference
    ``nets/architectures.py:432-508``)."""
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

    @nn.compact
    def __call__(self, x):
        assert self.ndim in (4, 5)
        if self.channel_first_io:
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

        x = self._tower(x, make_block)  # returns channel-first
        if not self.channel_first_io:
            x = _to_channels_last(x)
        return x


class _VNetConvIn(nn.Module):
    """conv_in (k=2/s=2) via the fused Pallas kernel, reading the raw
    channel-first input, with ConvNormAct's exact parameter tree
    (``conv_in/conv/{kernel,bias}`` [+ ``conv_in/norm/{scale,bias}``]).
    The kernel fuses SELU when use_snn; otherwise GroupNorm + activation
    run in XLA on the kernel output, matching ConvNormAct semantics."""
    features: int
    in_features: int
    activation: Union[str, Callable, None]
    use_snn: bool

    @nn.compact
    def __call__(self, x_cf):
        from ..kernels.conv_in import conv_in_s2d
        from .hnosegxs import _ConvParams
        snn = self.use_snn and is_selu(self.activation)
        kernel, bias = _ConvParams(self.features, self.in_features, 2,
                                   snn, name="conv")()
        y = conv_in_s2d(x_cf, kernel.astype(x_cf.dtype),
                        bias.astype(x_cf.dtype), apply_selu=snn)
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

    def _use_conv_in_kernel(self, x_cf):
        """Fused conv_in kernel: 3D, batch 1, channel-first input, on a
        real TPU (same gating as HNOSegXS)."""
        return (self.use_pallas and self.use_resize and self.ndim == 5
                and self.channel_first_io and x_cf.shape[0] == 1
                and jax.default_backend() == "tpu")

    @nn.compact
    def __call__(self, x):
        assert self.ndim in (4, 5)
        assert isinstance(self.num_blocks, (list, tuple))
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
                                self.output_activation)
        if not self.channel_first_io:
            x = _to_channels_last(x)
        return x
