#!/usr/bin/env python3
"""TPU kernel smoke: run every WIRED Pallas kernel on the real chip and diff
against the XLA path (VERDICT r02 #9).

Interpret-mode CPU tests can't see the Mosaic bug class (bool lowering,
compile hangs, tiling limits) that only appears on hardware — this makes
those regressions a command instead of an archaeology session:

  make tpu-smoke        # sort (2^16), upsample heads, masked engine
  make tpu-smoke-full   # + the chunked sort (2^17: adds one merge compile)

Exit 0 = all kernels compiled, ran, and matched XLA.  <2 min warm
(compiles hit the persistent cache), ~5 min cold.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

PASS = []
ONLY = None  # --only <substr>: run just the matching checks


def check(name, fn):
    if ONLY is not None and ONLY not in name:
        return
    t0 = time.perf_counter()
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — report and continue
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        PASS.append(False)
        return
    print(f"ok   {name} ({time.perf_counter() - t0:.1f}s)")
    PASS.append(True)


def _mismatch_frac(a, b):
    return float(np.mean(np.asarray(a) != np.asarray(b)))


def _assert_pairs_equal(ks, ps, kx, px):
    """Bitonic is unstable: payload order within exactly tied keys is
    unspecified, so compare (key, payload) PAIRS under a canonical
    lexicographic order — exact up to tie permutation, no slack bound."""
    ks, ps, kx, px = (np.asarray(a) for a in (ks, ps, kx, px))
    np.testing.assert_array_equal(ks, kx)
    for b in range(ks.shape[0]):
        got = np.lexsort((ps[b], ks[b]))
        want = np.lexsort((px[b], kx[b]))
        np.testing.assert_array_equal(ps[b][got], px[b][want])


def smoke_sort():
    from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import sort_pallas

    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randn(4, 1 << 16).astype(np.float32))
    pay = jnp.asarray(rng.randn(4, 1 << 16).astype(np.float32))
    ks, ps = sort_pallas(key, pay)
    kx, px = jax.lax.sort((key, pay), num_keys=1)
    _assert_pairs_equal(ks, ps, kx, px)


def smoke_sort_chunked():
    from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import sort_pallas

    rng = np.random.RandomState(1)
    key = jnp.asarray(rng.randn(2, 1 << 17).astype(np.float32))
    pay = jnp.asarray(rng.randn(2, 1 << 17).astype(np.float32))
    ks, ps = sort_pallas(key, pay)
    kx, px = jax.lax.sort((key, pay), num_keys=1)
    _assert_pairs_equal(ks, ps, kx, px)


def smoke_upsample_argmax():
    from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
        upsample_argmax,
        upsample_argmax_reference,
    )

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 32, 32, 21).astype(np.float32))
    got = upsample_argmax(x, (256, 256))
    want = upsample_argmax_reference(x, (256, 256))
    # MXU f32 rounding can flip exact near-ties vs the jnp path (~1e-6)
    frac = _mismatch_frac(got, want)
    assert frac < 1e-4, frac


def smoke_upsample_entropy_argmax():
    from ee_semantic_segmentation_tpu.ops.gating import norm_entropy
    from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
        upsample_entropy_argmax,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 32, 32, 21).astype(np.float32) * 2)
    lab, ent = upsample_entropy_argmax(x, (256, 256))
    up = jax.image.resize(x, (4, 256, 256, 21), method="bilinear")
    want_ent = jax.vmap(lambda p: norm_entropy(p, 21))(jax.nn.softmax(up, -1))
    np.testing.assert_allclose(np.asarray(ent), np.asarray(want_ent),
                               rtol=1e-4, atol=1e-5)
    frac = _mismatch_frac(lab, jnp.argmax(up, -1).astype(jnp.int32))
    assert frac < 1e-4, frac


def smoke_upsample_confusion():
    from ee_semantic_segmentation_tpu.ops.metrics import confusion_counts
    from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
        upsample_argmax,
        upsample_argmax_confusion,
    )

    rng = np.random.RandomState(4)
    C = 21
    x = jnp.asarray(rng.randn(4, 32, 32, C).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C + 1, (4, 256, 256)).astype(np.int32))
    got = np.asarray(upsample_argmax_confusion(x, labels, 3, (256, 256)))
    maps = upsample_argmax(x, (256, 256))
    tp, fp, fn = confusion_counts(maps, labels, C)
    mask = (np.arange(4) < 3).astype(np.float32)[:, None]
    want = np.stack([(np.asarray(v) * mask).sum(0) for v in (tp, fp, fn)])
    # near-tie argmax flips move single counts between classes
    assert np.abs(got - want).max() <= 16, np.abs(got - want).max()
    assert abs(got[0].sum() + got[2].sum() - (want[0].sum() + want[2].sum())) <= 32


def smoke_hist_lovasz():
    from ee_semantic_segmentation_tpu.ops.pallas import hist_kernel as hk

    rng = np.random.RandomState(5)
    BINS, rows, P = 1024, 4, 1 << 16
    valid = (rng.rand(rows, P) > 0.1).astype(np.float32)
    fg = ((rng.rand(rows, P) < 0.3) * valid).astype(np.float32)
    # snap errors to bucket CENTERS: Mosaic's FMA rounding of
    # (emax - e) * inv_w differs from XLA's by ~1 ULP, flipping pixels that
    # sit exactly on a bucket edge to the adjacent bucket (harmless for the
    # approximate loss, but it would make a raw-histogram diff flaky) — a
    # half-bucket margin makes both paths bit-deterministic.
    emax_v, emin_v = 4.0, 0.0
    width = (emax_v - emin_v) / BINS
    centers = emax_v - (rng.randint(0, BINS, (rows, P)) + 0.5) * width
    errors = np.where(valid > 0, centers, -1e30).astype(np.float32)
    emax = jnp.full((rows,), emax_v, jnp.float32)
    inv_w = jnp.full((rows,), BINS / (emax_v - emin_v), jnp.float32)
    e, f = jnp.asarray(errors), jnp.asarray(fg)
    got = hk.hist2d_weighted_pallas(e, f, emax, inv_w, bins=BINS)
    want = hk.hist2d_weighted_jnp(e, f, emax, inv_w, bins=BINS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=5e-2)
    tab = jnp.asarray(rng.randn(rows, 2, BINS).astype(np.float32))
    wg = hk.table_lookup_pallas(e, f, emax, inv_w, tab, bins=BINS)
    ww = hk.table_lookup_jnp(e, f, emax, inv_w, tab, bins=BINS)
    np.testing.assert_allclose(np.asarray(wg), np.asarray(ww),
                               rtol=1e-5, atol=1e-5)
    # end-to-end: hist loss within the analytic bound of the exact loss,
    # boundary jitter included (random, non-snapped errors)
    from ee_semantic_segmentation_tpu.ops.lovasz import _class_loss, _hist_class_loss

    pred = rng.randn(P).astype(np.float32) * 3
    v1 = (rng.rand(P) > 0.1).astype(np.float32)
    f1 = ((rng.rand(P) < 0.3) * v1).astype(np.float32)
    e1 = np.where(v1 > 0, np.abs(f1 - pred), -1e30).astype(np.float32)
    le = float(_class_loss(jnp.asarray(e1), jnp.asarray(f1), jnp.asarray(v1)))
    lh = float(_hist_class_loss(BINS, jnp.asarray(e1), jnp.asarray(f1), jnp.asarray(v1)))
    ev1 = e1[v1 > 0]
    assert abs(le - lh) <= (ev1.max() - ev1.min()) / BINS + 1e-5, (le, lh)


def smoke_masked_engine():
    from ee_semantic_segmentation_tpu.ee.masked import make_masked_gated_apply
    from ee_semantic_segmentation_tpu.ee.sequential import EarlyExitRunner
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )
    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    cfg = BranchyConfig(
        backbone_depth=50, img_dim=32, n_branches=1, segment_ends=(3,),
        branch_channels=(256,), num_classes=5,
    )
    model = BranchyDeepLabV3(config=cfg)
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(7), jnp.zeros((8, 32, 32, 3)))
    images = np.random.RandomState(3).rand(8, 32, 32, 3).astype(np.float32)
    var = {"params": state.params, "batch_stats": state.batch_stats}
    tau = 0.97
    for pallas_head in (False, True):
        fn = make_masked_gated_apply(model, var, tau=tau, n_classes=5,
                                     pallas_head=pallas_head)
        labels, exits = fn(jnp.asarray(images))
        runner = EarlyExitRunner(model, state.params, state.batch_stats,
                                 metric="ent", threshold=tau, n_classes=5)
        for i in range(4):  # 4 images is plenty for a smoke
            out = runner(images[i])
            assert int(exits[i]) == out["n"], (pallas_head, i)
            frac = _mismatch_frac(labels[i], out["exit"])
            assert frac < 1e-3, (pallas_head, i, frac)


def main():
    global ONLY
    full = "--full" in sys.argv
    if "--only" in sys.argv:
        ONLY = sys.argv[sys.argv.index("--only") + 1]
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind if jax.devices() else '?'})")
    if backend != "tpu":
        print("WARNING: not a TPU — kernels will run in interpret mode; this "
              "does NOT exercise Mosaic")
    t0 = time.perf_counter()
    check("sort_pallas 2^16", smoke_sort)
    check("upsample_argmax", smoke_upsample_argmax)
    check("upsample_entropy_argmax", smoke_upsample_entropy_argmax)
    check("upsample_argmax_confusion", smoke_upsample_confusion)
    check("hist_lovasz kernels", smoke_hist_lovasz)
    check("masked engine (xla + pallas heads)", smoke_masked_engine)
    if full:
        check("sort_pallas chunked 2^17", smoke_sort_chunked)
    print(f"total {time.perf_counter() - t0:.1f}s; "
          f"{sum(PASS)}/{len(PASS)} passed")
    return 0 if all(PASS) else 1


if __name__ == "__main__":
    sys.exit(main())
