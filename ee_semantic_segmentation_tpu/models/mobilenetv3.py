"""Dilated MobileNetV3-Large backbone (NHWC Flax) with FLOPs metadata.

The reference's model zoo is built on torchvision segmentation backbones
(its ``get_base_model`` regex-dispatches on the model string,
/root/reference/from_deepv3_new.py:41-54, and the author's broader framework
targeted ``mobilenet_v2_wdil`` too, main_bradeepv3.py:23).  The driver's
benchmark configs include a 2-exit MobileNetV3 branchy DeepLabV3
(BASELINE.json:8), so this implements torchvision's
``deeplabv3_mobilenet_v3_large`` backbone semantics:

* MobileNetV3-Large inverted-residual stack (hardswish / relu, SE blocks with
  hard-sigmoid, reduction 4 rounded to multiples of 8),
* ``dilated=True``: the last stride-2 stage keeps stride 1 with dilation 2
  (output stride 16),
* a final 1x1 conv to 960 channels (the "C5" features the DeepLab head
  consumes).

Exposed as stem + flat block list with the same FLOPs/geometry protocol as
resnet.BackboneSpec, so the branchy FLOPs-equipartition placement works
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ee_semantic_segmentation_tpu import flops as F


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclasses.dataclass(frozen=True)
class MNV3BlockSpec:
    name: str
    cin: int
    exp: int
    cout: int
    kernel: int
    stride: int
    dilation: int
    use_se: bool
    use_hs: bool
    is_conv1x1: bool = False  # the final 960-channel 1x1 conv "block"

    def flops(self, h: int, w: int) -> int:
        if self.is_conv1x1:
            total = F.conv2d_flops(h, w, self.cin, self.cout, 1)
            total += F.bn_flops(h, w, self.cout) + F.elementwise_flops(h, w, self.cout)
            return total
        oh, ow = -(-h // self.stride), -(-w // self.stride)
        total = 0
        if self.exp != self.cin:
            total += F.conv2d_flops(h, w, self.cin, self.exp, 1)
            total += F.bn_flops(h, w, self.exp) + F.elementwise_flops(h, w, self.exp)
        total += F.conv2d_flops(h, w, self.exp, self.exp, self.kernel, stride=self.stride, groups=self.exp)
        total += F.bn_flops(oh, ow, self.exp) + F.elementwise_flops(oh, ow, self.exp)
        if self.use_se:
            squeeze = _make_divisible(self.exp // 4)
            total += F.elementwise_flops(oh, ow, self.exp)  # global pool
            total += F.dense_flops(1, self.exp, squeeze) + F.dense_flops(1, squeeze, self.exp)
            total += F.elementwise_flops(oh, ow, self.exp)  # scale
        total += F.conv2d_flops(oh, ow, self.exp, self.cout, 1)
        total += F.bn_flops(oh, ow, self.cout)
        if self.stride == 1 and self.cin == self.cout:
            total += F.elementwise_flops(oh, ow, self.cout)  # residual add
        return total

    def out_shape(self, h: int, w: int):
        return -(-h // self.stride), -(-w // self.stride), self.cout


@dataclasses.dataclass(frozen=True)
class MNV3BackboneSpec:
    blocks: tuple[MNV3BlockSpec, ...]

    def stem_flops(self, h: int, w: int) -> int:
        oh, ow = -(-h // 2), -(-w // 2)
        return (
            F.conv2d_flops(h, w, 3, 16, 3, stride=2)
            + F.bn_flops(oh, ow, 16)
            + F.elementwise_flops(oh, ow, 16)
        )

    def stem_out(self, h: int, w: int):
        return -(-h // 2), -(-w // 2), 16

    def cumulative_flops(self, h: int, w: int):
        cum = []
        bh, bw, _ = self.stem_out(h, w)
        total = self.stem_flops(h, w)
        for blk in self.blocks:
            total += blk.flops(bh, bw)
            bh, bw, _ = blk.out_shape(bh, bw)
            cum.append(total)
        return cum

    def block_geometry(self, h: int, w: int):
        geo = []
        bh, bw, _ = self.stem_out(h, w)
        for blk in self.blocks:
            geo.append((bh, bw, blk.cin))
            bh, bw, _ = blk.out_shape(bh, bw)
        return geo


# (kernel, exp, out, SE, HS, stride) — MobileNetV3-Large
_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]


def mobilenet_v3_block_specs(dilated: bool = True) -> MNV3BackboneSpec:
    blocks = []
    cin = 16
    dilation = 1
    for i, (k, exp, out, se, hs, stride) in enumerate(_LARGE):
        if dilated and stride == 2 and i >= 12:  # last downsampling stage
            dilation *= stride
            stride = 1
        blocks.append(
            MNV3BlockSpec(
                name=f"layer{i + 1}.0",
                cin=cin,
                exp=exp,
                cout=out,
                kernel=k,
                stride=stride,
                dilation=dilation,
                use_se=se,
                use_hs=hs,
            )
        )
        cin = out
    # final 1x1 conv to 6*160 = 960 (torchvision lastconv)
    blocks.append(
        MNV3BlockSpec(
            name="lastconv.0", cin=cin, exp=cin, cout=960, kernel=1,
            stride=1, dilation=dilation, use_se=False, use_hs=True, is_conv1x1=True,
        )
    )
    return MNV3BackboneSpec(blocks=tuple(blocks))


# torchvision MobileNetV3 uses BatchNorm2d(eps=0.001) everywhere
# (torchvision/models/mobilenetv3.py norm_layer) — matched for weight-import
# numeric parity
BN_EPS = 1e-3


class MNV3Stem(nn.Module):
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), strides=2, padding=1, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum, epsilon=BN_EPS,
            dtype=self.dtype, axis_name=self.axis_name if train else None, name="bn",
        )(x)
        return nn.hard_swish(x)


class SqueezeExcite(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        squeeze = _make_divisible(self.channels // 4)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.hard_sigmoid(s)


class InvertedResidual(nn.Module):
    spec: MNV3BlockSpec
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=BN_EPS, dtype=self.dtype,
                axis_name=self.axis_name if train else None, name=name,
            )

        act = nn.hard_swish if s.use_hs else nn.relu
        if s.is_conv1x1:
            y = nn.Conv(s.cout, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
            return act(bn("bn")(y))

        inp = x
        y = x
        if s.exp != s.cin:
            y = nn.Conv(s.exp, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(y)
            y = act(bn("expand_bn")(y))
        pad = (s.kernel - 1) // 2 * s.dilation
        y = nn.Conv(
            s.exp, (s.kernel, s.kernel), strides=s.stride, padding=pad,
            kernel_dilation=s.dilation, feature_group_count=s.exp,
            use_bias=False, dtype=self.dtype, name="depthwise",
        )(y)
        y = act(bn("depthwise_bn")(y))
        if s.use_se:
            y = SqueezeExcite(s.exp, dtype=self.dtype, name="se")(y)
        y = nn.Conv(s.cout, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = bn("project_bn")(y)
        if s.stride == 1 and s.cin == s.cout:
            y = y + inp
        return y
