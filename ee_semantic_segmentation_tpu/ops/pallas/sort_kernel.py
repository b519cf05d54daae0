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

Direction handling: within stage ``s`` EVERY pass's direction bit is the
same function of the element index — ``(i >> s) & 1`` — so instead of
computing a direction iota and a signed predicate in every pass, keys are
negated once per stage wherever that bit is 1 ("sign trick").  All passes
then become direction-free ascending exchanges: one compare, min/max for
the keys, two selects for the payload (~5 vector ops vs ~12 for the
per-pass-direction form).  Measured on one v5e chip at the Lovász
workload shape (1008 rows): P=2^16 48.9 us/row vs 62 for the
per-pass-direction form (1.27x; lax.sort 83); at chunked P=2^18 the
XLA cross-chunk passes dominate and the in-kernel win washes out
(337.6 vs 343.0 ms).

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


def _halves_2d(x, d: int):
    """(rows, minor) -> the two (g*d, minor) halves of pairs at major
    distance d.  All elementwise work stays on 2-D vectors (Mosaic lowers
    higher-rank / singleton-dim bool vectors poorly — a 4-D i1 vector hit
    'Unsupported target bitwidth for truncation' on v5e)."""
    rows, minor = x.shape
    g = rows // (2 * d)
    v = x.reshape(g, 2, d, minor)
    return (
        v[:, 0].reshape(g * d, minor),
        v[:, 1].reshape(g * d, minor),
        (rows, minor, g, d),
    )


def _join_2d(a, b, dims):
    rows, minor, g, d = dims
    return jnp.stack(
        [a.reshape(g, d, minor), b.reshape(g, d, minor)], axis=1
    ).reshape(rows, minor)


def _pass_asc(key, pay, d: int):
    """One ASCENDING compare-exchange pass at major-axis distance d rows.

    The swap predicate is a bare comparison used only as a select mask —
    bool-VALUED selects (``where(dir, ka<kb, kb<ka)``) make Mosaic
    materialize i8 bool vectors and fail with 'Unsupported target bitwidth
    for truncation' on v5e; direction is realized by key negation at the
    stage level (see ``_stage_resign``), never here.
    """
    ka, kb, dims = _halves_2d(key, d)
    pa, pb, _ = _halves_2d(pay, d)
    swap = ka > kb
    k0 = jnp.minimum(ka, kb)
    k1 = jnp.maximum(ka, kb)
    p0 = jnp.where(swap, pb, pa)
    p1 = jnp.where(swap, pa, pb)
    return _join_2d(k0, k1, dims), _join_2d(p0, p1, dims)


def _elem_bit(shape, b: int, in_t: bool):
    """Bit ``b`` of the element index i as an int32 iota over the current
    2-D view: normal (R, 128) puts i's lane bits (0..6) on axis 1; the
    transposed (128, R) view puts them on axis 0."""
    if b >= _LOG_LANES:
        axis, shift = (1 if in_t else 0), b - _LOG_LANES
    else:
        axis, shift = (0 if in_t else 1), b
    q = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return (q >> shift) & 1


def _stage_resign(key, prev_s, new_s: int, in_t: bool, m: int):
    """Move keys from stage prev_s's sign space into stage new_s's.

    During stage s every pair's direction bit is ``(i >> s) & 1``; negating
    keys where that bit is 1 makes all of stage s's passes ascending.  The
    transition multiplies by sgn_prev * sgn_new = 1 - 2*(bit_prev ^ bit_new)
    — one elementwise multiply per stage instead of per-pass direction
    arithmetic.  Bit m of i < 2^m is always 0, so stage m's space is the
    identity (the final output needs no un-negation).
    """
    bits = None
    if prev_s is not None and prev_s < m:
        bits = _elem_bit(key.shape, prev_s, in_t)
    if new_s < m:
        b2 = _elem_bit(key.shape, new_s, in_t)
        bits = b2 if bits is None else bits ^ b2
    if bits is None:
        return key
    return key * (1 - 2 * bits).astype(key.dtype)


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
    prev_s = None
    for s in range(1, m + 1):
        key = _stage_resign(key, prev_s, s, in_t, m)
        prev_s = s
        for k_exp in range(s - 1, -1, -1):
            if k_exp >= _LOG_LANES:
                if in_t:
                    key, pay = key.T, pay.T
                    in_t = False
                # normal layout: major axis is i >> 7
                key, pay = _pass_asc(key, pay, 1 << (k_exp - _LOG_LANES))
            else:
                if not in_t:
                    key, pay = key.T, pay.T
                    in_t = True
                # transposed layout (128, R): major axis is i & 127
                key, pay = _pass_asc(key, pay, 1 << k_exp)
    # stage m's sign space is the identity — nothing to undo
    if in_t:
        key, pay = key.T, pay.T
    return key, pay


def bitonic_merge_2d(key: jnp.ndarray, pay: jnp.ndarray):
    """Uniform-ascending bitonic MERGE of a (R, 128) row: the within-chunk
    tail of one outer stage — passes d = R*64 .. 1, all ascending.  The
    caller realizes per-chunk descending direction by negating keys (the
    sign trick), so the kernel itself is direction-free."""
    R, L = key.shape
    P = R * L
    m = P.bit_length() - 1
    in_t = False
    for k_exp in range(m - 1, -1, -1):
        if k_exp >= _LOG_LANES:
            if in_t:
                key, pay = key.T, pay.T
                in_t = False
            key, pay = _pass_asc(key, pay, 1 << (k_exp - _LOG_LANES))
        else:
            if not in_t:
                key, pay = key.T, pay.T
                in_t = True
            key, pay = _pass_asc(key, pay, 1 << k_exp)
    if in_t:
        key, pay = key.T, pay.T
    return key, pay


def _sort_kernel(key_ref, pay_ref, key_out, pay_out):
    k, p = bitonic_sort_2d(key_ref[0], pay_ref[0])
    key_out[0] = k
    pay_out[0] = p


def _merge_kernel(key_ref, pay_ref, key_out, pay_out):
    k, p = bitonic_merge_2d(key_ref[0], pay_ref[0])
    key_out[0] = k
    pay_out[0] = p


def _rowwise_call(kernel, key3, pay3, interpret: bool):
    """pallas_call helper: grid over rows of (B, R, 128) key+payload."""
    B, R, L = key3.shape
    spec = pl.BlockSpec((1, R, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, L), key3.dtype),
            jax.ShapeDtypeStruct((B, R, L), pay3.dtype),
        ],
        interpret=interpret,
    )(key3, pay3)


_CHUNK = 1 << 16  # single-kernel full-SORT sweet spot; Mosaic hangs above
# Largest single merge-KERNEL row.  A merge is only m+1 unrolled passes
# (18 at 2^17, vs 136+ for a full sort network, which is what hangs
# Mosaic).  2^18 is out: Mosaic's per-pass stack temporaries put the
# kernel at 23.46 MB scoped VMEM vs the 16 MB limit (measured on v5e);
# 2^17 fits and is verified exact on-chip.
_MERGE_MAX = 1 << 17


def _sort_chunked(key, pay, interpret: bool):
    """Sort rows of P = nc * 2^16 (nc a power of two) elements:

    1. sort every 2^16 chunk with the single-row kernel (stages 1..16 of
       the global bitonic network; odd chunks then reversed to realize the
       alternating post-stage-16 directions);
    2. for each outer stage s = 17..m: one VMEM merge kernel covers whole
       blocks of up to _MERGE_MAX elements (per-block descending direction
       realized by the sign trick: negate keys, merge ascending, negate
       back — exact for f32/int32); only distances beyond the kernel's
       coverage (blocks > _MERGE_MAX) run as whole-chunk elementwise
       min/max passes in plain XLA (the direction recursion collapses onto
       the chunk axis).  For the common 512² case (P=2^18) there are NO
       XLA passes: chunk-sort, merge@2^17, merge@2^18 — three kernel
       launches, one HBM round trip each.
    """
    B, P = key.shape
    nc = P // _CHUNK
    mc = nc.bit_length() - 1  # outer stages count
    R = _CHUNK // _LANES
    merge_c = max(1, _MERGE_MAX // _CHUNK)  # chunks per merge-kernel row

    k3 = key.reshape(B * nc, R, _LANES)
    p3 = pay.reshape(B * nc, R, _LANES)
    ks, ps = _rowwise_call(_sort_kernel, k3, p3, interpret)
    k = ks.reshape(B, nc, _CHUNK)
    p = ps.reshape(B, nc, _CHUNK)
    # post-stage-16 state: chunk c sorted ascending iff bit 0 of c is 0
    flip = (jnp.arange(nc) & 1) == 1
    k = jnp.where(flip[:, None], k[:, :, ::-1], k)
    p = jnp.where(flip[:, None], p[:, :, ::-1], p)

    for sc in range(1, mc + 1):  # outer stage s = 16 + sc
        mch = min(1 << sc, merge_c)  # chunks per merge row this stage
        # cross-chunk XLA passes only at distances the merge kernel can't
        # reach: kc = sc-1 .. log2(mch) in chunk units
        for kc in range(sc - 1, -1, -1):
            dc = 1 << kc
            if dc < mch:
                break
            g = nc // (2 * dc)
            kv = k.reshape(B, g, 2, dc, _CHUNK)
            pv = p.reshape(B, g, 2, dc, _CHUNK)
            ka, kb = kv[:, :, 0], kv[:, :, 1]
            pa, pb = pv[:, :, 0], pv[:, :, 1]
            gi = jnp.arange(g)
            dir_i = ((gi >> (sc - kc - 1)) & 1)[None, :, None, None]
            sgn = (1 - 2 * dir_i).astype(ka.dtype)
            swap = (ka - kb) * sgn > 0
            k = jnp.stack(
                [jnp.where(swap, kb, ka), jnp.where(swap, ka, kb)], axis=2
            ).reshape(B, nc, _CHUNK)
            p = jnp.stack(
                [jnp.where(swap, pb, pa), jnp.where(swap, pa, pb)], axis=2
            ).reshape(B, nc, _CHUNK)
        # merge kernel over rows of mch chunks (each such row is bitonic
        # after the passes above); direction of the block containing chunk
        # c at stage s is (c >> sc) & 1, constant across each merge row
        ci = jnp.arange(nc)
        csgn = (1 - 2 * ((ci >> sc) & 1)).astype(key.dtype)[None, :, None]
        kneg = (k * csgn).reshape(B * (nc // mch), mch * R, _LANES)
        ks, ps = _rowwise_call(
            _merge_kernel, kneg,
            p.reshape(B * (nc // mch), mch * R, _LANES), interpret,
        )
        k = ks.reshape(B, nc, _CHUNK) * csgn
        p = ps.reshape(B, nc, _CHUNK)

    return k.reshape(B, P), p.reshape(B, P)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_pallas(key: jnp.ndarray, pay: jnp.ndarray, interpret: bool | None = None):
    """Ascending sort of each row: (B, P) key + (B, P) payload, P = 2^m >= 1024.

    Drop-in for ``jax.lax.sort((key, pay), num_keys=1)`` up to tie order
    (bitonic is not stable; all consumers here are tie-invariant).
    Rows above 2^16 use the chunked sort+merge scheme (see _sort_chunked).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, P = key.shape
    if P > _CHUNK:
        return _sort_chunked(key, pay, interpret)
    R = P // _LANES
    kv = key.reshape(B, R, _LANES)
    pv = pay.reshape(B, R, _LANES)
    ks, ps = _rowwise_call(_sort_kernel, kv, pv, interpret)
    return ks.reshape(B, P), ps.reshape(B, P)


def sortable(P: int) -> bool:
    """True when sort_pallas supports a row length of P.

    P <= 2^16 runs the single-row kernel (a monolithic full-sort kernel
    at 2^17+ hangs Mosaic's compile, >10 min); larger rows use the
    chunked sort+merge scheme whose kernels stay at 2^16/2^17.  The cap
    is 2^22 (a 2048x2048 image) — matching the packed-payload f32
    exactness bound in ops/lovasz.py (4P - 1 <= 2^24); measured at 2^21
    (2048x1024, the Cityscapes full-res training shape) the chunked sort
    still beats lax.sort on a v5e chip.
    """
    return 1024 <= P <= (1 << 22) and (P & (P - 1)) == 0
