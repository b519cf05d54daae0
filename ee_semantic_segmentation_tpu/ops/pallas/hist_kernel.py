"""Weighted bucket-histogram + table-lookup Pallas kernels (MXU one-hot dots).

These power the sort-free "histogram Lovász" path (ops/lovasz.py): the Lovász
extension's weight vector telescopes over runs of equal errors, so with errors
bucketed into ``B`` uniform-width descending bins the whole sorted computation
collapses to

  * four weighted histograms over the buckets
    (pixel count, foreground count, error sum, foreground error sum), and
  * a per-pixel lookup of a per-bucket gradient weight table in the backward.

A TPU-idiomatic histogram is NOT a scatter (measured 7-13x slower than sorts
at these shapes, ops/lovasz.py): it is a **one-hot matrix product**.  Bucket
ids split into (b1, b2) = (idx >> 7, idx & 127); the (B1=B/128, 128) histogram
is ``onehot(b1)-weighted @ onehot(b2)^T`` — an MXU contraction over pixels
that never materializes a (P, B) one-hot in HBM.  Both kernels stream pixel
chunks through VMEM with **pixels along lanes** (blocks (1, 1, chunk); a
(chunk, 1) sublane layout pads every value to a full 128-lane tile and was
also rejected by Mosaic's (8, 128) block-tiling rule):

  hist:   lhs (4*B1, T) = variant-weighted onehot(b1) (broadcast from (1, T)
          rows over sublanes), rhs (128, T) = onehot(b2) sublane-iota mask
          -> dot_general contracting the lane (pixel) dim of BOTH operands
          (A @ B^T) -> per-chunk (4*B1, 128) partials, summed in XLA.  No
          grid revisiting / program_id accumulation, so vmap (which prepends
          a grid axis) is safe by construction.
  lookup: C (2*B1, T) = table @ onehot(b2) gathers each pixel's lane-column
          of the table; a sublane one-hot of the (fg-selected) table row then
          masks + sublane-reduces C to the per-pixel weight.

Work per pixel is O(B) MACs (B <= 4096 here) versus the bitonic sort's
O(log^2 P) VMEM sweeps over the whole row — and it is MXU work, not VPU.

Void pixels arrive with their error at ``_NEG_BIG`` (ops/lovasz.py) and are
excluded by deriving ``valid = error > _VALID_THRESH`` in-kernel; padding
added to round P up to the chunk size uses the same convention.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_VALID_THRESH = -1e29  # void slots carry _NEG_BIG = -1e30
_DEF_CHUNK = 4096


def _bucket_ids(e, emax, inv_w, bins: int):
    """Descending bucket index (0 = largest error) per pixel, clipped."""
    t = jnp.clip((emax - e) * inv_w, 0.0, float(bins - 1))
    idx = t.astype(jnp.int32)
    return idx >> 7, idx & (_LANES - 1)


def _hist_kernel(stat_ref, e_ref, fg_ref, out_ref, *, bins: int):
    b1_sub = bins // _LANES
    log_b1 = b1_sub.bit_length() - 1
    e = e_ref[0]  # (1, T) — pixels along lanes
    fg = fg_ref[0]
    T = e.shape[1]
    emax = stat_ref[0, 0, 0]
    inv_w = stat_ref[0, 0, 1]
    valid = (e > _VALID_THRESH).astype(jnp.float32)
    b1, b2 = _bucket_ids(e, emax, inv_w, bins)  # (1, T) int32

    sub = jax.lax.broadcasted_iota(jnp.int32, (_LANES, T), 0)
    oh2 = (b2 == sub).astype(jnp.float32)  # (128, T)

    # lhs (4*B1, T): rows k = variant * B1 + j1, weighted one-hot of b1;
    # every broadcast is a cheap (1, T) -> (K, T) sublane replication
    vt = valid
    fgt = fg * valid
    et = e * valid
    eft = e * fgt
    K = 4 * b1_sub
    kidx = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)
    j1 = kidx & (b1_sub - 1)
    variant = kidx >> log_b1
    w = jnp.where(
        variant == 0, vt, jnp.where(variant == 1, fgt, jnp.where(variant == 2, et, eft))
    )
    oh1w = jnp.where(b1 == j1, w, 0.0)  # (K, T)
    part = jax.lax.dot_general(  # A @ B^T: contract the pixel (lane) dim
        oh1w, oh2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: the lhs carries real error values — the MXU's default
        # single-bf16-pass f32 matmul costs ~0.4% relative on the error
        # sums (measured via tpu_smoke); 3-pass keeps them f32-accurate
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, 128)
    out_ref[0, 0] = part


def _lookup_kernel(stat_ref, tab_ref, e_ref, fg_ref, out_ref, *, bins: int):
    b1_sub = bins // _LANES
    e = e_ref[0]  # (1, T)
    fg = fg_ref[0]
    emax = stat_ref[0, 0, 0]
    inv_w = stat_ref[0, 0, 1]
    valid = (e > _VALID_THRESH).astype(jnp.float32)
    b1, b2 = _bucket_ids(e, emax, inv_w, bins)
    T = e.shape[1]

    sub = jax.lax.broadcasted_iota(jnp.int32, (_LANES, T), 0)
    oh2 = (b2 == sub).astype(jnp.float32)  # (128, T)
    # C[row, t] = tab[row, b2[t]]: gather every pixel's lane-column
    # (HIGHEST: table entries are real-valued gradient weights — see
    # the matching note in _hist_kernel)
    C = jnp.dot(tab_ref[0], oh2, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (2*B1, T)
    # table rows: [0, B1) = foreground weights, [B1, 2*B1) = background
    r = b1 + jnp.where(fg > 0, 0, b1_sub)  # (1, T)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (2 * b1_sub, T), 0)
    m = jnp.sum(jnp.where(r == ridx, C, 0.0), axis=0, keepdims=True)  # (1, T)
    out_ref[0] = m * valid


def _chunked(x, rows: int, nc: int, chunk: int, fill):
    """(rows, P) -> (rows, 1, nc*chunk), tail padded with ``fill`` (a
    singleton sublane dim so (1, 1, chunk) blocks satisfy Mosaic tiling)."""
    P = x.shape[1]
    pad = nc * chunk - P
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
    return x[:, None, :]


@functools.partial(jax.jit, static_argnames=("bins", "chunk", "interpret"))
def hist2d_weighted_pallas(
    errors, fg, emax, inv_w, *, bins: int, chunk: int = _DEF_CHUNK,
    interpret: bool | None = None,
):
    """(rows, P) errors/fg + per-row (emax, inv_w) -> (rows, 4, bins) f32:
    [count, fg count, error sum, fg error sum] per descending bucket."""
    _check_bins(bins)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, P = errors.shape
    b1_sub = bins // _LANES
    nc = -(-P // chunk)
    eT = _chunked(errors, rows, nc, chunk, -1e30)
    fT = _chunked(fg, rows, nc, chunk, 0.0)
    stats = jnp.stack([emax, inv_w], axis=1)[:, None, :]  # (rows, 1, 2)

    pix = pl.BlockSpec(
        (1, 1, chunk), lambda r, c: (r, 0, c), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_hist_kernel, bins=bins),
        grid=(rows, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda r, c: (r, 0, 0), memory_space=pltpu.SMEM),
            pix,
            pix,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 4 * b1_sub, _LANES), lambda r, c: (r, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (rows, nc, 4 * b1_sub, _LANES), jnp.float32
        ),
        interpret=interpret,
    )(stats, eT, fT)
    return out.sum(axis=1).reshape(rows, 4, bins)


@functools.partial(jax.jit, static_argnames=("bins", "chunk", "interpret"))
def table_lookup_pallas(
    errors, fg, emax, inv_w, tables, *, bins: int, chunk: int = _DEF_CHUNK,
    interpret: bool | None = None,
):
    """Per-pixel gradient weights: (rows, P) errors/fg + (rows, 2, bins)
    [fg, bg] bucket tables -> (rows, P) f32 weights (0 on void pixels)."""
    _check_bins(bins)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, P = errors.shape
    b1_sub = bins // _LANES
    nc = -(-P // chunk)
    eT = _chunked(errors, rows, nc, chunk, -1e30)
    fT = _chunked(fg, rows, nc, chunk, 0.0)
    stats = jnp.stack([emax, inv_w], axis=1)[:, None, :]
    tab = tables.reshape(rows, 2 * b1_sub, _LANES)

    pix = pl.BlockSpec(
        (1, 1, chunk), lambda r, c: (r, 0, c), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, bins=bins),
        grid=(rows, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda r, c: (r, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 2 * b1_sub, _LANES), lambda r, c: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pix,
            pix,
        ],
        out_specs=pix,
        out_shape=jax.ShapeDtypeStruct((rows, 1, nc * chunk), jnp.float32),
        interpret=interpret,
    )(stats, tab, eT, fT)
    return out.reshape(rows, nc * chunk)[:, :P]


# ------------------------------------------------------------- jnp fallback
def hist2d_weighted_jnp(errors, fg, emax, inv_w, *, bins: int):
    """Scatter-add reference implementation (fast on CPU, exact everywhere)."""
    _check_bins(bins)
    valid = (errors > _VALID_THRESH).astype(jnp.float32)
    t = jnp.clip((emax[:, None] - errors) * inv_w[:, None], 0.0, float(bins - 1))
    idx = t.astype(jnp.int32)

    def one_row(i, e, f, v):
        z = jnp.zeros((bins,), jnp.float32)
        return jnp.stack([
            z.at[i].add(v),
            z.at[i].add(f * v),
            z.at[i].add(e * v),
            z.at[i].add(e * f * v),
        ])

    return jax.vmap(one_row)(idx, errors, fg, valid)


def table_lookup_jnp(errors, fg, emax, inv_w, tables, *, bins: int):
    _check_bins(bins)
    valid = (errors > _VALID_THRESH).astype(jnp.float32)
    t = jnp.clip((emax[:, None] - errors) * inv_w[:, None], 0.0, float(bins - 1))
    idx = t.astype(jnp.int32)

    def one_row(i, f, v, tab):
        w = jnp.where(f > 0, tab[0][i], tab[1][i])
        return w * v

    return jax.vmap(one_row)(idx, fg, valid, tables)


def _impl() -> str:
    mode = os.environ.get("EE_TPU_LOVASZ_HIST_IMPL", "auto")
    if mode in ("pallas", "jnp"):
        return mode
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def hist2d_weighted(errors, fg, emax, inv_w, *, bins: int):
    if _impl() == "pallas":
        return hist2d_weighted_pallas(errors, fg, emax, inv_w, bins=bins)
    return hist2d_weighted_jnp(errors, fg, emax, inv_w, bins=bins)


def table_lookup(errors, fg, emax, inv_w, tables, *, bins: int):
    if _impl() == "pallas":
        return table_lookup_pallas(errors, fg, emax, inv_w, tables, bins=bins)
    return table_lookup_jnp(errors, fg, emax, inv_w, tables, bins=bins)


def hist_bins_ok(bins: int) -> bool:
    """Supported bucket counts: bins = B1 * 128 with B1 a power of two."""
    b1 = bins // _LANES
    return bins % _LANES == 0 and b1 >= 1 and (b1 & (b1 - 1)) == 0


def _check_bins(bins: int) -> None:
    """Direct kernel callers get a clear error, not silent b1_sub=0 garbage
    (validation otherwise lives only in lovasz_softmax_flat; ADVICE r03)."""
    if not hist_bins_ok(bins):
        raise ValueError(
            f"hist bins must be 128 * a power of two (got {bins}); "
            "see hist_bins_ok()"
        )
