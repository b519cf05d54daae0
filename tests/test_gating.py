"""Tests for gating metrics: entropy, SSIM, NMI, VI against independent
numpy/scipy computations."""

import numpy as np
import pytest

from ee_semantic_segmentation_tpu.ops import gating as G


def test_pixel_entropy_uniform_is_one():
    c = 8
    probs = np.full((4, 4, c), 1.0 / c, np.float32)
    ent = np.asarray(G.pixel_entropy(probs, c))
    np.testing.assert_allclose(ent, 1.0, rtol=1e-5)


def test_pixel_entropy_matches_scipy():
    from scipy.stats import entropy as sp_entropy

    rng = np.random.RandomState(0)
    logits = rng.randn(5, 6, 7).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ours = np.asarray(G.pixel_entropy(probs, 7))
    ref = sp_entropy(probs, base=7, axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_norm_entropy_pooling():
    # block_reduce with cval=0 padding: max pool of a 3x3 with size 2
    ent_map = np.arange(9, dtype=np.float32).reshape(3, 3) / 10.0
    pooled = np.asarray(G._block_reduce(ent_map, 2, "max"))
    expect = np.array([[0.4, 0.5], [0.7, 0.8]])
    np.testing.assert_allclose(pooled, expect, rtol=1e-6)


def test_batched_norm_entropy_shape():
    rng = np.random.RandomState(1)
    stacked = rng.randn(3, 2, 8, 8, 5).astype(np.float32)
    out = np.asarray(G.batched_norm_entropy(stacked, 5))
    assert out.shape == (3, 2)
    assert (out >= 0).all() and (out <= 1.0 + 1e-6).all()


def _ssim_numpy(a, b, data_range, win=7):
    """Direct skimage-formula implementation for cross-checking."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    h, w = a.shape
    npx = win * win
    cov_norm = npx / (npx - 1)
    oh, ow = h - win + 1, w - win + 1
    ux = np.zeros((oh, ow)); uy = np.zeros((oh, ow))
    uxx = np.zeros((oh, ow)); uyy = np.zeros((oh, ow)); uxy = np.zeros((oh, ow))
    for i in range(oh):
        for j in range(ow):
            wa = a[i : i + win, j : j + win]
            wb = b[i : i + win, j : j + win]
            ux[i, j] = wa.mean(); uy[i, j] = wb.mean()
            uxx[i, j] = (wa * wa).mean(); uyy[i, j] = (wb * wb).mean()
            uxy[i, j] = (wa * wb).mean()
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_ssim_matches_direct():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 20, (16, 16))
    b = np.where(rng.rand(16, 16) < 0.8, a, rng.randint(0, 20, (16, 16)))
    ours = float(G.ssim_int(a, b, data_range=20))
    ref = _ssim_numpy(a, b, 20)
    assert ours == pytest.approx(ref, rel=1e-5)
    assert float(G.ssim_int(a, a, data_range=20)) == pytest.approx(1.0, rel=1e-6)


def test_mse():
    a = np.array([[0, 1], [2, 3]])
    b = np.array([[0, 2], [2, 5]])
    assert float(G.mse_int(a, b)) == pytest.approx((0 + 1 + 0 + 4) / 4)


def test_nmi_matches_direct():
    from scipy.stats import entropy as sp_entropy

    rng = np.random.RandomState(3)
    a = rng.randint(0, 5, (12, 12))
    b = np.where(rng.rand(12, 12) < 0.7, a, rng.randint(0, 5, (12, 12)))
    joint = np.zeros((5, 5))
    for x, y in zip(a.ravel(), b.ravel()):
        joint[x, y] += 1
    p = joint / joint.sum()
    ha = sp_entropy(p.sum(1))
    hb = sp_entropy(p.sum(0))
    hab = sp_entropy(p.ravel())
    ref = (ha + hb) / hab
    assert float(G.nmi(a, b, 5)) == pytest.approx(ref, rel=1e-5)
    # identical maps: NMI = 2
    assert float(G.nmi(a, a, 5)) == pytest.approx(2.0, rel=1e-5)


def test_vi_properties():
    rng = np.random.RandomState(4)
    a = rng.randint(0, 5, (12, 12))
    b = np.where(rng.rand(12, 12) < 0.7, a, rng.randint(0, 5, (12, 12)))
    # identical maps: VI = 0
    assert float(G.vi(a, a, 5)) == pytest.approx(0.0, abs=1e-6)
    v = float(G.vi(a, b, 5))
    assert v > 0
    # VI = H(b|a) + H(a|b) and seg_comp returns the individual terms
    t_xy = float(G.seg_comp(a, b, 5, x_y=True))
    t_yx = float(G.seg_comp(a, b, 5, x_y=False))
    assert v == pytest.approx(t_xy + t_yx, rel=1e-5)


def test_vi_ignore_labels():
    a = np.array([[0, 0, 1, 1], [2, 2, 1, 1]])
    b = np.array([[0, 0, 2, 2], [2, 2, 1, 1]])
    full = float(G.vi(a, b, 3))
    # ignoring label 0 in the first image drops those pixels
    ig = float(G.vi(a, b, 3, ignore=(0,)))
    assert ig != pytest.approx(full)
    a2 = a[a != 0]
    b2 = b[a != 0]
    joint = np.zeros((3, 3))
    for x, y in zip(a2.ravel(), b2.ravel()):
        joint[x, y] += 1
    p = joint / joint.sum()

    def h(v):
        v = v[v > 0]
        return -(v * np.log2(v)).sum()

    hab = h(p.ravel()); ha = h(p.sum(1)); hb = h(p.sum(0))
    assert ig == pytest.approx((hab - ha) + (hab - hb), rel=1e-5)


def test_batched_similarity_shapes():
    rng = np.random.RandomState(5)
    preds = rng.randint(0, 5, (3, 2, 10, 10))
    for metric in ("ssim", "mse", "nmi", "vi", "h_xy", "h_yx"):
        out = np.asarray(G.batched_similarity(preds, metric, 5))
        assert out.shape == (2, 2), metric
