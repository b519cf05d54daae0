"""Reusable conv blocks for the ``conv_blks`` registry.

The reference's registry (module_variables.py:26-32) maps these five names
to classes from ``conv_blocks`` — a module MISSING from the snapshot (only
the import and the registry keys survive, SURVEY.md "incomplete snapshot").
These are clean-room reconstructions from the names and the author's
surrounding conventions (my_layers.py's ConvLayer padding/BN/act style):

* ``InvertedResidualBlk`` — generic MobileNetV2-style MBConv (1x1 expand ->
  3x3 depthwise -> 1x1 linear project, residual when shapes allow).  The
  MobileNetV3 backbone has its own spec-driven ``InvertedResidual``
  (models/mobilenetv3.py:202); this one is the registry-friendly
  free-standing form.
* ``InceptionBlk`` — GoogLeNet-style 4-branch block (1x1 | 1x1->3x3 |
  1x1->3x3->3x3 | maxpool->1x1) concatenated to ``features`` channels.
* ``CIncepBlk`` — "concatenated inception": InceptionBlk plus an identity
  passthrough branch concatenated to the output (assumption documented;
  upstream source does not exist to compare against).
* ``HDConvBlk`` — hybrid dilated convolution block (sequential 3x3 convs
  with gridding-free dilations 1, 2, 5 — Wang et al. 2018).
* ``WaveBlk`` — Haar-DWT downsample (reusing my_layers.py:159's DWT
  semantics via models/layers.haar_dwt) followed by a 3x3 ConvLayer.

All blocks are channels-last, BN in train mode via ``train=...`` like every
other module in this package.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.models.layers import ConvLayer, haar_dwt


class InvertedResidualBlk(nn.Module):
    """MobileNetV2-style MBConv: expand -> depthwise -> linear project."""

    features: int
    expand: int = 4
    stride: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expand
        pad = (self.kernel_size - 1) // 2
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(mid, (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=pad,
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride == 1 and cin == self.features:
            y = y + x
        return y


class InceptionBlk(nn.Module):
    """4-branch inception block; branch widths split ``features`` 1/4 each
    (the 3x3 double branch absorbs the remainder)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.features < 4:
            raise ValueError(
                f"InceptionBlk needs features >= 4 (one channel per branch), "
                f"got {self.features}")
        f = self.features // 4
        f3 = self.features - 3 * f
        b1 = ConvLayer(f, kernel_size=1, dtype=self.dtype)(x, train=train)
        b2 = ConvLayer(f, kernel_size=1, dtype=self.dtype)(x, train=train)
        b2 = ConvLayer(f, kernel_size=3, dtype=self.dtype)(b2, train=train)
        b3 = ConvLayer(f3, kernel_size=1, dtype=self.dtype)(x, train=train)
        b3 = ConvLayer(f3, kernel_size=3, n_convs=2, dtype=self.dtype)(b3, train=train)
        b4 = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        b4 = ConvLayer(f, kernel_size=1, dtype=self.dtype)(b4, train=train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class CIncepBlk(nn.Module):
    """InceptionBlk with the block INPUT concatenated to its output
    (dense-style feature reuse).  Output channels = features + C_in."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = InceptionBlk(self.features, dtype=self.dtype)(x, train=train)
        return jnp.concatenate([x, y], axis=-1)


class HDConvBlk(nn.Module):
    """Hybrid dilated convolutions: sequential 3x3 convs at gridding-free
    dilation rates (default 1, 2, 5)."""

    features: int
    dilations: Sequence[int] = (1, 2, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for d in self.dilations:
            x = ConvLayer(self.features, kernel_size=3, dilation=d,
                          dtype=self.dtype)(x, train=train)
        return x


class WaveBlk(nn.Module):
    """Haar DWT (H, W, C) -> (H/2, W/2, 4C) four-band downsample followed
    by a 3x3 conv to ``features`` channels."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = haar_dwt(x)
        return ConvLayer(self.features, kernel_size=3,
                         dtype=self.dtype)(x, train=train)
