"""ASPP, DeepLabHead and the custom branch head (NHWC Flax).

Mirrors the torchvision modules the reference composes
(/root/reference/from_deepv3_new.py:13,15-39):

* ``ASPP(cin, rates, cout)``: 1x1 branch, one 3x3 atrous branch per rate,
  global-average-pooling branch, concat, 1x1 projection (+ dropout 0.5),
* ``DeepLabHead(cin, classes)`` = ASPP(cin, (12, 24, 36), 256) + 3x3 conv +
  BN + ReLU + 1x1 classifier,
* ``BranchHead`` = the reference's ``my_branch``: optional 1x1 bottleneck,
  ASPP, 3x3 conv + BN + ReLU, 1x1 classifier (from_deepv3_new.py:15-39).

Each module exposes ``*_flops(h, w, ...)`` companions used by the branchy
builder and the per-exit FLOPs CSVs.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import jax

from ee_semantic_segmentation_tpu import flops as F


def _bn(train, dtype, momentum, axis_name, name):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        dtype=dtype,
        axis_name=axis_name if train else None,
        name=name,
    )


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (torchvision layout)."""

    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cout = self.out_channels
        branches = []
        # conv0: 1x1
        b = nn.Conv(cout, (1, 1), use_bias=False, dtype=self.dtype, name="conv0")(x)
        branches.append(nn.relu(_bn(train, self.dtype, self.bn_momentum, self.axis_name, "bn0")(b)))
        # atrous 3x3 branches
        for i, rate in enumerate(self.atrous_rates, start=1):
            b = nn.Conv(
                cout,
                (3, 3),
                padding=rate,
                kernel_dilation=rate,
                use_bias=False,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            branches.append(
                nn.relu(_bn(train, self.dtype, self.bn_momentum, self.axis_name, f"bn{i}")(b))
            )
        # global pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(cout, (1, 1), use_bias=False, dtype=self.dtype, name="pool_conv")(g)
        g = nn.relu(_bn(train, self.dtype, self.bn_momentum, self.axis_name, "pool_bn")(g))
        g = jnp.broadcast_to(g, branches[0].shape)
        branches.append(g)

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(cout, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = nn.relu(_bn(train, self.dtype, self.bn_momentum, self.axis_name, "project_bn")(y))
        if train and self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate, deterministic=False)(y)
        return y


def aspp_flops(h: int, w: int, cin: int, cout: int = 256, n_rates: int = 3) -> int:
    total = F.conv2d_flops(h, w, cin, cout, 1) + F.bn_flops(h, w, cout) + F.elementwise_flops(h, w, cout)
    for _ in range(n_rates):
        total += F.conv2d_flops(h, w, cin, cout, 3) + F.bn_flops(h, w, cout) + F.elementwise_flops(h, w, cout)
    # pooling branch: global mean + 1x1 on 1x1 + broadcast
    total += F.elementwise_flops(h, w, cin)
    total += F.conv2d_flops(1, 1, cin, cout, 1) + F.bn_flops(1, 1, cout)
    # projection over concatenated (n_rates + 2) * cout channels
    total += F.conv2d_flops(h, w, (n_rates + 2) * cout, cout, 1)
    total += F.bn_flops(h, w, cout) + F.elementwise_flops(h, w, cout)
    return total


class DeepLabHead(nn.Module):
    """torchvision DeepLabHead: ASPP + 3x3 conv + BN + ReLU + 1x1 classifier."""

    num_classes: int = 21
    mid_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ASPP(
            self.mid_channels,
            self.atrous_rates,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            name="aspp",
        )(x, train=train)
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.relu(_bn(train, self.dtype, self.bn_momentum, self.axis_name, "bn")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(x)


def deeplab_head_flops(h: int, w: int, cin: int, num_classes: int = 21, mid: int = 256) -> int:
    total = aspp_flops(h, w, cin, mid)
    total += F.conv2d_flops(h, w, mid, mid, 3) + F.bn_flops(h, w, mid) + F.elementwise_flops(h, w, mid)
    total += F.conv2d_flops(h, w, mid, num_classes, 1, bias=True)
    return total


class BranchHead(nn.Module):
    """The reference's ``my_branch`` (from_deepv3_new.py:15-39): optional 1x1
    bottleneck, ASPP with custom rates/width, 3x3 conv + BN + ReLU, 1x1."""

    num_classes: int = 21
    nout_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    bottleneck: int | None = None
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bottleneck:
            x = nn.Conv(self.bottleneck, (1, 1), dtype=self.dtype, name="bottleneck")(x)
        x = ASPP(
            self.nout_channels,
            self.atrous_rates,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            name="aspp",
        )(x, train=train)
        x = nn.Conv(self.nout_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.relu(_bn(train, self.dtype, self.bn_momentum, self.axis_name, "bn")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(x)


def branch_head_flops(
    h: int,
    w: int,
    cin: int,
    num_classes: int = 21,
    nout: int = 256,
    n_rates: int = 3,
    bottleneck: int | None = None,
) -> int:
    total = 0
    if bottleneck:
        total += F.conv2d_flops(h, w, cin, bottleneck, 1, bias=True)
        cin = bottleneck
    total += aspp_flops(h, w, cin, nout, n_rates)
    total += F.conv2d_flops(h, w, nout, nout, 3) + F.bn_flops(h, w, nout) + F.elementwise_flops(h, w, nout)
    total += F.conv2d_flops(h, w, nout, num_classes, 1, bias=True)
    return total
