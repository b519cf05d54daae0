"""Dilated ResNet-50/101 backbone (NHWC Flax) with analytic FLOPs metadata.

Matches the torchvision backbone used by the reference's
``deeplabv3_resnet{50,101}`` (/root/reference/from_deepv3_new.py:41-54):
output-stride 8 via ``replace_stride_with_dilation=[False, True, True]``
— layer3 becomes stride-1/dilation-2 and layer4 stride-1/dilation-4, with
each stage's *first* block using the previous stage's dilation (torchvision
``_make_layer`` semantics).

The backbone is deliberately exposed as a *stem + flat list of bottleneck
blocks* (named ``layerX.Y`` like torchvision's ``named_modules``): the
branchy builder slices this list into segments at FLOPs-equipartition
boundaries exactly where the reference splits ``nn.Sequential`` sections
(from_deepv3_new.py:75-95).

TPU notes: convolutions run in the module ``dtype`` (bfloat16 by default on
TPU) with float32 params and float32 BatchNorm statistics; XLA fuses the
BN+ReLU chains into the convs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ee_semantic_segmentation_tpu import flops as F


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """Static description of one bottleneck block."""

    name: str  # torchvision-style "layer1.0"
    cin: int
    width: int
    cout: int
    stride: int
    dilation: int
    downsample: bool

    def flops(self, h: int, w: int) -> int:
        oh, ow = -(-h // self.stride), -(-w // self.stride)
        total = F.conv2d_flops(h, w, self.cin, self.width, 1)
        total += F.bn_flops(h, w, self.width) + F.elementwise_flops(h, w, self.width)
        total += F.conv2d_flops(h, w, self.width, self.width, 3, stride=self.stride)
        total += F.bn_flops(oh, ow, self.width) + F.elementwise_flops(oh, ow, self.width)
        total += F.conv2d_flops(oh, ow, self.width, self.cout, 1)
        total += F.bn_flops(oh, ow, self.cout)
        if self.downsample:
            total += F.conv2d_flops(h, w, self.cin, self.cout, 1, stride=self.stride)
            total += F.bn_flops(oh, ow, self.cout)
        total += 2 * F.elementwise_flops(oh, ow, self.cout)  # add + relu
        return total

    def out_shape(self, h: int, w: int) -> tuple[int, int, int]:
        return -(-h // self.stride), -(-w // self.stride), self.cout


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    """Stem + ordered block list + geometry helpers."""

    depth: int
    blocks: tuple[BlockSpec, ...]

    def stem_flops(self, h: int, w: int) -> int:
        oh, ow = -(-h // 2), -(-w // 2)
        total = F.conv2d_flops(h, w, 3, 64, 7, stride=2)
        total += F.bn_flops(oh, ow, 64) + F.elementwise_flops(oh, ow, 64)
        ph, pw = -(-oh // 2), -(-ow // 2)
        total += F.pool_flops(ph, pw, 64, 3)
        return total

    def stem_out(self, h: int, w: int) -> tuple[int, int, int]:
        return -(-h // 4), -(-w // 4), 64

    def cumulative_flops(self, h: int, w: int) -> list[int]:
        """Cumulative FLOPs (stem + blocks[0..i]) and per-block geometry."""
        cum = []
        bh, bw, _ = self.stem_out(h, w)
        total = self.stem_flops(h, w)
        for blk in self.blocks:
            total += blk.flops(bh, bw)
            bh, bw, _ = blk.out_shape(bh, bw)
            cum.append(total)
        return cum

    def block_geometry(self, h: int, w: int) -> list[tuple[int, int, int]]:
        """Input geometry (h, w, cin) of each block at input image size."""
        geo = []
        bh, bw, bc = self.stem_out(h, w)
        for blk in self.blocks:
            geo.append((bh, bw, blk.cin))
            bh, bw, bc = blk.out_shape(bh, bw)
        return geo


_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def resnet_block_specs(
    depth: int = 101,
    output_stride: int = 8,
) -> BackboneSpec:
    """Build the torchvision-compatible dilated block list."""
    counts = _STAGE_BLOCKS[depth]
    widths = (64, 128, 256, 512)
    if output_stride == 8:
        dilate = (False, False, True, True)
    elif output_stride == 16:
        dilate = (False, False, False, True)
    else:
        dilate = (False, False, False, False)

    blocks: list[BlockSpec] = []
    cin = 64
    dilation = 1
    for stage, (n_blocks, width) in enumerate(zip(counts, widths)):
        stride = 1 if stage == 0 else 2
        previous_dilation = dilation
        if dilate[stage]:
            dilation *= stride
            stride = 1
        cout = width * 4
        for i in range(n_blocks):
            blocks.append(
                BlockSpec(
                    name=f"layer{stage + 1}.{i}",
                    cin=cin if i == 0 else cout,
                    width=width,
                    cout=cout,
                    stride=stride if i == 0 else 1,
                    dilation=previous_dilation if i == 0 else dilation,
                    downsample=(i == 0 and (stride != 1 or cin != cout)),
                )
            )
        cin = cout
    return BackboneSpec(depth=depth, blocks=tuple(blocks))


class ResNetStem(nn.Module):
    """conv7x7/2 + BN + ReLU + maxpool3x3/2 (torchvision stem)."""

    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 reduce, 3x3 (stride/dilated), 1x1 expand."""

    spec: BlockSpec
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
                name=name,
            )

        identity = x
        out = nn.Conv(s.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            s.width,
            (3, 3),
            strides=s.stride,
            padding=s.dilation,
            kernel_dilation=s.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(s.cout, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if s.downsample:
            identity = nn.Conv(
                s.cout, (1, 1), strides=s.stride, use_bias=False, dtype=self.dtype, name="downsample_conv"
            )(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)
