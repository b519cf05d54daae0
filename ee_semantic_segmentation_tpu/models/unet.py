"""U-Net / early-exit U-Net / convolutional autoencoder family (NHWC Flax).

The reference's registry points at ``UNet``, ``EUNet``, ``AE`` and
``branchy_unet`` constructors (/root/reference/module_variables.py:39-46)
whose source files (``build_unet``, ``from_unet``, ``build_ae``) are
**missing from the published snapshot** (SURVEY.md: 11 unresolvable
imports).  These are clean-room reconstructions of that capability so the
registry surface is complete:

* :class:`UNet` — classic encoder/decoder with skip concatenations,
* :class:`BranchyUNet` — early-exit U-Net: each decoder level emits a
  segmentation exit, upsampled to input size and stacked ``(E, N, H, W, C)``
  exactly like the branchy DeepLabV3, so every loss / evaluator / gating
  engine in this framework applies unchanged,
* :class:`AE` — convolutional autoencoder (reconstruction output in [0,1]),
  pairs with the trainer's ``ae_mode`` evaluators (funcs.py:80-129) and the
  ``ae_train_epoch`` path (train_funcs.py:37-58).

All blocks are ConvLayer-style (3x3 conv + BN + ReLU) with fixed shapes;
down = stride-2 conv (TPU-friendlier than pooling), up = resize + conv
(avoids checkerboarding transposed convs).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvBNRelu(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


class _Down(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNRelu(self.features, stride=2, dtype=self.dtype)(x, train)
        return _ConvBNRelu(self.features, dtype=self.dtype)(x, train)


class _Up(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")
        x = jnp.concatenate([x, skip], axis=-1)
        x = _ConvBNRelu(self.features, dtype=self.dtype)(x, train)
        return _ConvBNRelu(self.features, dtype=self.dtype)(x, train)


class UNet(nn.Module):
    num_classes: int = 21
    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = list(self.widths)
        x = _ConvBNRelu(w[0], dtype=self.dtype, name="stem")(x, train)
        skips = [x]
        for i, f in enumerate(w[1:]):
            x = _Down(f, dtype=self.dtype, name=f"down_{i}")(x, train)
            skips.append(x)
        for i, f in enumerate(reversed(w[:-1])):
            x = _Up(f, dtype=self.dtype, name=f"up_{i}")(x, skips[-(i + 2)], train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)


class BranchyUNet(nn.Module):
    """Early-exit U-Net: one segmentation exit per decoder level (coarsest
    first), stacked (E, N, H, W, C) like BranchyDeepLabV3.forward."""

    num_classes: int = 21
    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.float32

    @property
    def n_branches(self) -> int:
        return len(self.widths) - 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = list(self.widths)
        out_hw = x.shape[1:3]
        n = x.shape[0]
        x = _ConvBNRelu(w[0], dtype=self.dtype, name="stem")(x, train)
        skips = [x]
        for i, f in enumerate(w[1:]):
            x = _Down(f, dtype=self.dtype, name=f"down_{i}")(x, train)
            skips.append(x)
        outputs = []
        n_levels = len(w) - 1
        for i, f in enumerate(reversed(w[:-1])):
            x = _Up(f, dtype=self.dtype, name=f"up_{i}")(x, skips[-(i + 2)], train)
            # one exit per decoder level; the last (finest) is the main head
            name = "head" if i == n_levels - 1 else f"exit_{i}"
            y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name=name)(x)
            y = jax.image.resize(
                y.astype(jnp.float32), (n, out_hw[0], out_hw[1], self.num_classes),
                method="bilinear",
            )
            outputs.append(y)
        return jnp.stack(outputs)


class AE(nn.Module):
    """Convolutional autoencoder; reconstruction via sigmoid head."""

    widths: Sequence[int] = (32, 64, 128)
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = list(self.widths)
        y = _ConvBNRelu(w[0], dtype=self.dtype, name="enc_stem")(x, train)
        for i, f in enumerate(w[1:]):
            y = _Down(f, dtype=self.dtype, name=f"enc_{i}")(y, train)
        for i, f in enumerate(reversed(w[:-1])):
            n, h, wd, c = y.shape
            y = jax.image.resize(y, (n, h * 2, wd * 2, c), method="bilinear")
            y = _ConvBNRelu(f, dtype=self.dtype, name=f"dec_{i}")(y, train)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="head")(y)
        return nn.sigmoid(y)
