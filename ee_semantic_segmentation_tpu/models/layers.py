"""Reusable layer library (NHWC Flax) — the my_layers.py equivalents.

Re-designs /root/reference/my_layers.py:

* ``Lambda`` (my_layers.py:6-14), ``DenseLayer`` (:16-43), ``ConvLayer``
  (:45-99, incl. the ``padding = (k-1)//2 * dilation`` rule and the
  activation zoo), ``DWTLayer`` (:159-193, Haar DWT via even/odd slicing ->
  4-band concat).
* ``Base_layer`` (:111-157) is dead code in the reference (its forward calls
  a multiprocessing Pool whose import is commented out, common_torch.py:8)
  and is intentionally not reproduced.
* ``get_layers`` (:199-212) — a module-tree flattener whose reference
  version always returns [] (SURVEY.md bug #1); the working equivalent here
  is :func:`iter_param_leaves` over the variables tree.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACTS: dict[str, Callable] = {
    "relu": nn.relu,
    "relu6": jax.nn.relu6,
    "selu": jax.nn.selu,
    "leaky relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "mish": jax.nn.mish,
}


class Lambda(nn.Module):
    fn: Callable

    @nn.compact
    def __call__(self, x):
        return self.fn(x)


class DenseLayer(nn.Module):
    """Linear + (BatchNorm when act is relu-ish and no norm given) + act."""

    features: int
    act_func: str = "relu"
    use_norm: bool | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        norm = self.use_norm
        if norm is None:
            norm = "relu" in self.act_func
        if norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        act = _ACTS.get(self.act_func, nn.relu)
        return act(x)


class ConvLayer(nn.Module):
    """n_convs x (conv or transposed conv) + optional BN + activation.

    Padding follows the reference's ``(kernel - 1) // 2 * dilation`` rule
    (my_layers.py:54)."""

    features: int
    n_convs: int = 1
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    n_groups: int = 1
    transpose: bool = False
    act_func: str = "relu"
    use_norm: bool | None = None
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        for _ in range(self.n_convs):
            if self.transpose:
                x = nn.ConvTranspose(
                    self.features,
                    (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                )(x)
            else:
                x = nn.Conv(
                    self.features,
                    (self.kernel_size, self.kernel_size),
                    strides=self.stride,
                    padding=pad,
                    kernel_dilation=self.dilation,
                    feature_group_count=self.n_groups,
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                )(x)
        norm = self.use_norm
        if norm is None:
            norm = "relu" in self.act_func
        if norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        act = _ACTS.get(self.act_func)
        return act(x) if act else x


def haar_dwt(x: jnp.ndarray) -> jnp.ndarray:
    """Single-level Haar DWT by even/odd slicing (my_layers.py:166-185),
    NHWC: (N, H, W, C) -> (N, H/2, W/2, 4C) bands [LL, LH, HL, HH]."""
    x_e = x[:, ::2]
    x_o = x[:, 1::2]
    x_ee = x_e[:, :, ::2]
    x_eo = x_e[:, :, 1::2]
    x_oe = x_o[:, :, ::2]
    x_oo = x_o[:, :, 1::2]
    ll = x_ee + x_oe + x_eo + x_oo
    hl = -x_ee - x_oe + x_eo + x_oo
    lh = -x_ee + x_oe - x_eo + x_oo
    hh = x_ee - x_oe - x_eo + x_oo
    return jnp.concatenate([ll, lh, hl, hh], axis=-1)


class DWTLayer(nn.Module):
    """Parameter-free Haar DWT layer with optional pad-to-even
    (my_layers.py:159-193)."""

    pad: bool = False

    @nn.compact
    def __call__(self, x):
        if self.pad:
            if (x.shape[2] // 2) % 2:
                x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
            if (x.shape[1] // 2) % 2:
                x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        return haar_dwt(x)


def iter_param_leaves(variables) -> list[tuple[tuple, Any]]:
    """Flatten a variables tree to (path, leaf) pairs — the working
    replacement for the reference's broken ``get_layers``."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    return [(tuple(getattr(k, "key", str(k)) for k in path), leaf) for path, leaf in flat]
