"""Fused argmax + confusion-count Pallas kernel.

The mIoU path (ops/metrics.confusion_counts, mirroring
compute_mIoU.py:16-27) builds two (P, C) one-hot matrices and three
products — XLA materializes them in HBM.  This kernel streams (pred-logit,
label) pixel tiles and accumulates TP / FP / FN per class in a VMEM
accumulator, writing back a single (3, C_padded) array.

Per tile: argmax over the (masked) class lanes, then class-equality masks
against a broadcasted class-id row vector reduce-summed over pixels:
    tp_c = sum_p [pred_p == c][label_p == c]
    fp_c = sum_p [pred_p == c][label_p != c & label_p valid_or_not]
    fn_c = sum_p [pred_p != c][label_p == c]
Void labels (>= C) contribute FP to the predicted class and nothing else —
the reference's crop semantics (seg_metrics.py:21-27).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_P = 1024


def _confusion_tile_kernel(logits_ref, labels_ref, out_ref, acc_ref, *, n_classes: int, n_pixels: int):
    t = pl.program_id(0)
    num_tiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = logits_ref[...].astype(jnp.float32)  # (TILE_P, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(lane < n_classes, x, -1e30)
    pred = jnp.argmax(x, axis=1)  # (TILE_P,)

    labels = labels_ref[...][:, 0]  # (TILE_P,)
    row = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)[:, 0] + t * _TILE_P
    valid_pix = row < n_pixels

    cls = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], _LANES), 1)
    pred_eq = (pred[:, None] == cls) & valid_pix[:, None]
    lab_eq = (labels[:, None] == cls) & valid_pix[:, None]

    tp = jnp.sum((pred_eq & lab_eq).astype(jnp.float32), axis=0)
    fp = jnp.sum((pred_eq & ~lab_eq).astype(jnp.float32), axis=0)
    fn = jnp.sum((~pred_eq & lab_eq).astype(jnp.float32), axis=0)
    acc_ref[0, :] += tp
    acc_ref[1, :] += fp
    acc_ref[2, :] += fn

    @pl.when(t == num_tiles - 1)
    def _():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_classes", "interpret"))
def confusion_pallas(logits, labels, n_classes: int, interpret: bool = False):
    """(N, H, W, C) logits + (N, H, W) int labels -> (3, n_classes) float32
    batch-summed TP/FP/FN (drop-in for metrics.confusion_update)."""
    N, H, W, C = logits.shape
    p = N * H * W
    p_pad = -(-p // _TILE_P) * _TILE_P
    x = logits.reshape(p, C)
    x = jnp.pad(x, ((0, p_pad - p), (0, _LANES - C)))
    lab = labels.reshape(p, 1).astype(jnp.int32)
    lab = jnp.pad(lab, ((0, p_pad - p), (0, 0)), constant_values=-1)

    num_tiles = p_pad // _TILE_P
    out = pl.pallas_call(
        functools.partial(_confusion_tile_kernel, n_classes=n_classes, n_pixels=p),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_P, _LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_P, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, _LANES), jnp.float32)],
        interpret=interpret,
    )(x, lab)
    return out[:, :n_classes]
