"""Batched VMEM-resident bitonic sort (key + one payload) Pallas kernel.

Why: Lovász training is sort-bound (ops/lovasz.py sorts per class per image;
~600 ms of a 760 ms step at 256² batch 16 on one v5e chip).  XLA's generic
``lax.sort`` streams many passes through HBM; one (P,) row of the Lovász
sort is only P*8 bytes (key f32 + payload f32) — 512 KB at 256², 2 MB at
512² — so the ENTIRE bitonic network can run out of VMEM with one HBM read
and one HBM write per row.

Layout: a row of P = 2^m elements is viewed as (R, 128), element i at
(i >> 7, i & 127).  A bitonic compare-exchange at distance d = 2^k is:

* k >= 7 (row distance): reshape the major axis to (G, 2, d/128, 128) and
  min/max the two halves — pure sublane-block ops, no lane movement.
* k < 7 (lane distance): the same exchange on the TRANSPOSED (128, R) view,
  where former lane bits are the major axis — one transpose per run of
  lane-phase passes instead of per-pass lane shuffles.

The direction bit of every bitonic pair reduces to a single-axis iota
(``(i >> s) & 1`` collapses onto the group axis / the r axis — derivation in
``_dir_bit``), so passes are pure elementwise selects.

Used by ops/lovasz.py when the flat pixel count is a power of two >= 2^10
(every square power-of-two resolution); XLA's sort remains the fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_LOG_LANES = 7


def _dir_bit(shape4, axis: int, shift: int):
    """((iota over `axis`) >> shift) & 1 as a bool broadcast over shape4."""
    q = jax.lax.broadcasted_iota(jnp.int32, shape4, axis)
    return ((q >> shift) & 1) == 1


def _pass_major(key, pay, k_exp: int, s: int, log_rows_minor: int):
    """One compare-exchange pass at distance 2^k_exp along the MAJOR axis of
    a (rows, minor) view; ``log_rows_minor`` is log2(elements per major row)
    (7 in normal layout, log2(R) in transposed layout is NOT used — see
    _dir_bit call sites for the direction derivation)."""
    rows, minor = key.shape
    d = 1 << (k_exp - log_rows_minor)  # distance in major rows
    g = rows // (2 * d)
    kv = key.reshape(g, 2, d, minor)
    pv = pay.reshape(g, 2, d, minor)
    ka, kb = kv[:, 0], kv[:, 1]
    pa, pb = pv[:, 0], pv[:, 1]
    # direction bit (i >> s) & 1 collapses onto the group axis (derivation in
    # the module docstring); s > k always, so the shift is >= 0
    dir1 = _dir_bit(ka.shape, 0, s - k_exp - 1)
    swap = jnp.where(dir1, ka < kb, kb < ka)  # dir1: descending pair
    k0 = jnp.where(swap, kb, ka)
    k1 = jnp.where(swap, ka, kb)
    p0 = jnp.where(swap, pb, pa)
    p1 = jnp.where(swap, pa, pb)
    key = jnp.stack([k0, k1], axis=1).reshape(rows, minor)
    pay = jnp.stack([p0, p1], axis=1).reshape(rows, minor)
    return key, pay


def _pass_major_dir_minor(key, pay, k_exp: int, s: int, minor_shift: int):
    """Major-axis pass whose direction bit lives on the MINOR axis
    (transposed layout, s >= 7: dir = (r >> (s-7)) & 1 with r the minor
    index)."""
    rows, minor = key.shape
    d = 1 << k_exp
    g = rows // (2 * d)
    kv = key.reshape(g, 2, d, minor)
    pv = pay.reshape(g, 2, d, minor)
    ka, kb = kv[:, 0], kv[:, 1]
    pa, pb = pv[:, 0], pv[:, 1]
    dir1 = _dir_bit(ka.shape, 2, minor_shift)  # iota over the minor axis
    swap = jnp.where(dir1, ka < kb, kb < ka)
    k0 = jnp.where(swap, kb, ka)
    k1 = jnp.where(swap, ka, kb)
    p0 = jnp.where(swap, pb, pa)
    p1 = jnp.where(swap, pa, pb)
    key = jnp.stack([k0, k1], axis=1).reshape(rows, minor)
    pay = jnp.stack([p0, p1], axis=1).reshape(rows, minor)
    return key, pay


def bitonic_sort_2d(key: jnp.ndarray, pay: jnp.ndarray):
    """Ascending bitonic sort of a (R, 128) row (element i at (i>>7, i&127)).

    Pure jnp — runs as the Pallas kernel body and standalone in tests.
    """
    R, L = key.shape
    assert L == _LANES and (R & (R - 1)) == 0 and R >= 1
    P = R * L
    m = P.bit_length() - 1

    # Transposed layout caches: keyT/payT are (128, R) views (element i at
    # (i & 127, i >> 7)); maintained lazily across lane-phase runs.
    in_t = False
    for s in range(1, m + 1):
        for k_exp in range(s - 1, -1, -1):
            if k_exp >= _LOG_LANES:
                if in_t:
                    key, pay = key.T, pay.T
                    in_t = False
                # normal layout: major axis is i >> 7
                key, pay = _pass_major(key, pay, k_exp, s, _LOG_LANES)
            else:
                if not in_t:
                    key, pay = key.T, pay.T
                    in_t = True
                # transposed layout (128, R): major axis is i & 127, minor is r
                if s >= _LOG_LANES:
                    key, pay = _pass_major_dir_minor(
                        key, pay, k_exp, s, s - _LOG_LANES
                    )
                else:
                    key, pay = _pass_major(key, pay, k_exp, s, 0)
    if in_t:
        key, pay = key.T, pay.T
    return key, pay


def _sort_kernel(key_ref, pay_ref, key_out, pay_out):
    k, p = bitonic_sort_2d(key_ref[0], pay_ref[0])
    key_out[0] = k
    pay_out[0] = p


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_pallas(key: jnp.ndarray, pay: jnp.ndarray, interpret: bool | None = None):
    """Ascending sort of each row: (B, P) key + (B, P) payload, P = 2^m >= 1024.

    Drop-in for ``jax.lax.sort((key, pay), num_keys=1)`` up to tie order
    (bitonic is not stable; all consumers here are tie-invariant).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, P = key.shape
    R = P // _LANES
    kv = key.reshape(B, R, _LANES)
    pv = pay.reshape(B, R, _LANES)
    ks, ps = pl.pallas_call(
        _sort_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, _LANES), key.dtype),
            jax.ShapeDtypeStruct((B, R, _LANES), pay.dtype),
        ],
        interpret=interpret,
    )(kv, pv)
    return ks.reshape(B, P), ps.reshape(B, P)


def sortable(P: int) -> bool:
    """True when sort_pallas supports a row length of P.

    Upper bound: key+payload in and out blocks are VMEM-resident
    (4 buffers x P x 4 B); P = 2^19 (a 1024x512 image) uses 8 MB of the
    ~16 MB VMEM.  Per-image Lovász at 256²/512² (2^16 / 2^18) is the target.
    """
    return 1024 <= P <= (1 << 19) and (P & (P - 1)) == 0
