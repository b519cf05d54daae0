"""Fused softmax + normalized-entropy + mean Pallas kernel.

The entropy gate (ops/gating.py, mirroring eval_br_ent.py:19-36) needs the
*image mean* of pixelwise softmax entropies.  The jnp path materializes the
(N, H, W, C) probability tensor in HBM before reducing; for a 512x512x21
batch that is ~22 MB of extra HBM write+read per image per exit.  This
kernel streams logit tiles HBM->VMEM once and writes back a single scalar
per image: entropy = mean_p [ log Z_p - (sum_c e^{x_pc - m_p} (x_pc - m_p))/Z_p ] / ln C.

Layout: the (H*W, C) pixel matrix is tiled along pixels; the class axis is
padded to the 128-lane width and masked.  Accumulation across pixel tiles
uses a VMEM scratch accumulator, written out on the last tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_P = 512  # pixels per tile (sublane-friendly multiple of 8)


def _entropy_tile_kernel(x_ref, out_ref, acc_ref, *, n_classes: int, n_pixels: int):
    """Grid: (num_tiles,) over pixel tiles of ONE image."""
    t = pl.program_id(0)
    num_tiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[...].astype(jnp.float32)  # (TILE_P, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    class_mask = lane < n_classes
    neg = jnp.float32(-1e30)
    x = jnp.where(class_mask, x, neg)

    m = jnp.max(x, axis=1, keepdims=True)
    ex = jnp.where(class_mask, jnp.exp(x - m), 0.0)
    z = jnp.sum(ex, axis=1, keepdims=True)
    # H_p = log z - sum(ex * (x - m)) / z
    s = jnp.sum(jnp.where(class_mask, ex * (x - m), 0.0), axis=1, keepdims=True)
    h = jnp.log(z) - s / z  # (TILE_P, 1)

    row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) + t * _TILE_P
    h = jnp.where(row < n_pixels, h, 0.0)
    acc_ref[0, 0] += jnp.sum(h)

    @pl.when(t == num_tiles - 1)
    def _():
        inv = 1.0 / (jnp.float32(n_pixels) * jnp.log(jnp.float32(n_classes)))
        out_ref[0, 0] = acc_ref[0, 0] * inv


def _entropy_grid_kernel(x_ref, out_ref, acc_ref, *, n_classes: int, n_pixels: int):
    """Grid: (images, tiles) — tiles iterate fastest, so the SMEM accumulator
    carries across one image's tiles and resets at t == 0."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    num_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[0].astype(jnp.float32)  # (TILE_P, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    class_mask = lane < n_classes
    x = jnp.where(class_mask, x, jnp.float32(-1e30))
    m = jnp.max(x, axis=1, keepdims=True)
    ex = jnp.where(class_mask, jnp.exp(x - m), 0.0)
    z = jnp.sum(ex, axis=1, keepdims=True)
    s = jnp.sum(jnp.where(class_mask, ex * (x - m), 0.0), axis=1, keepdims=True)
    h = jnp.log(z) - s / z
    row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) + t * _TILE_P
    h = jnp.where(row < n_pixels, h, 0.0)
    acc_ref[0, 0] += jnp.sum(h)

    @pl.when(t == num_tiles - 1)
    def _():
        inv = 1.0 / (jnp.float32(n_pixels) * jnp.log(jnp.float32(n_classes)))
        out_ref[i, 0] = acc_ref[0, 0] * inv


@functools.partial(jax.jit, static_argnames=("n_classes", "interpret"))
def batched_entropy_pallas(stacked_logits, n_classes: int, interpret: bool = False):
    """(E, N, H, W, C) logits -> (E, N) mean normalized entropy per image.

    Drop-in for ops.gating.batched_norm_entropy (pool='none').  One
    pallas_call with a 2-D (images, tiles) grid — the (E, N) axes are folded
    into the grid instead of vmapping the kernel per image.  The output
    lives whole in SMEM (TPU lowering requires full-array blocks there);
    each image writes its row at its last tile.
    """
    E, N, H, W, C = stacked_logits.shape
    p = H * W
    p_pad = -(-p // _TILE_P) * _TILE_P
    x = stacked_logits.reshape(E * N, p, C)
    x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, _LANES - C)))
    num_tiles = p_pad // _TILE_P

    out = pl.pallas_call(
        functools.partial(_entropy_grid_kernel, n_classes=n_classes, n_pixels=p),
        grid=(E * N, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, _TILE_P, _LANES), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((E * N, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(x)
    return out.reshape(E, N)
