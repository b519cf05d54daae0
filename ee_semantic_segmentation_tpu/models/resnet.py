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
import jax
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


class _S2DConv7x7(nn.Module):
    """The stem's 7x7/2 conv computed as a 4x4/1 conv on space-to-depth input.

    A conv with C_in=3 runs the MXU at ~5% of peak (3 of 128 contraction
    lanes; measured in tools/bench_breakdown.py).  Rewriting
    ``out[p,q] = sum_{u,v,c} W[u,v,c] x[2p+u-3, 2q+v-3, c]`` over 2x2
    space-to-depth blocks ``x2[m,n,(di,dj,c)] = x[2m+di, 2n+dj, c]`` gives
    an EXACT equivalent 4x4 stride-1 conv with C_in=12 and padding (2,1):
    substituting ``u = 2a + di - 1`` maps tap ``u`` onto s2d offset
    ``a-2``, a in 0..3 (the a=0,di=0 row falls outside the 7-tap support
    and is zero).  4x the contraction depth, 1/4 the output positions ->
    same MACs, 4x the arithmetic intensity.

    Declares the SAME param as nn.Conv (``kernel`` (7,7,3,64)) so
    checkpoints and the torchvision weight importer are layout-identical;
    the rearrangement below is a tiny pad+reshape on the weights,
    recomputed per step (9408 elements — noise).

    MEASURED NEGATIVE on one v5e chip (tools/bench_breakdown.py --only
    stem, 512² b32): 5.5 ms vs 4.3 ms plain.  The stem's 5%-MXU conv is
    not the cost — the stem is HBM-bound on the conv-output/BN/maxpool
    traffic, which this rewrite does not reduce, and the NHWC
    space-to-depth input relayout adds ~1 ms.  Kept (off by default) as
    the exact-equivalence experiment backing STATUS.md's roofline claim
    that the early-stage gap is bandwidth, not MXU granularity.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, self.features),
            jnp.float32,
        )
        N, H, W, C = x.shape
        x2 = x.reshape(N, H // 2, 2, W // 2, 2, C)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)
        # weight rearrangement as pure pad+reshape: u+1 = 2a+di maps the
        # zero-front-padded 8-tap axis onto (a, di); channel order
        # (di, dj, c) matches x2's space-to-depth order above.
        Kf = self.features
        w_pad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = (
            w_pad.reshape(4, 2, 4, 2, C, Kf)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * C, Kf)
        )
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype),
            w2.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNetStem(nn.Module):
    """conv7x7/2 + BN + ReLU + maxpool3x3/2 (torchvision stem).

    ``s2d=True`` computes the 7x7 conv via the exact space-to-depth
    rewrite above (same params, same math, 4x arithmetic intensity).
    """

    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            x = _S2DConv7x7(features=64, dtype=self.dtype, name="conv1")(x)
        else:
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
