"""Shared numeric fixtures for golden-parity tests.

These generate the *inputs* (numpy, NCHW like the reference) used both by
``tools/gen_golden.py`` (which runs the reference's torch implementations at
/root/reference to produce expected values, stored in tests/golden/*.json)
and by the pytest suite (which runs our JAX ops on the same inputs and
compares against the stored numbers).

The hand-drawn 4-class scene mirrors the reference's own executable fixtures
(new_seg_losses.py:170-243, compute_mIoU.py:65-138) — tiny label maps whose
metric values are easy to verify by hand.
"""

from __future__ import annotations

import numpy as np

# 2-sample, 4-class, 4x6 hand-drawn scene (new_seg_losses.py:171-188).
HAND_TRUE = np.array(
    [
        [[0, 1, 1, 1, 0, 0], [1, 1, 2, 2, 1, 1], [1, 1, 2, 2, 1, 1], [0, 1, 1, 1, 0, 0]],
        [[0, 3, 3, 3, 2, 0], [0, 3, 2, 2, 3, 1], [0, 3, 2, 2, 3, 1], [0, 3, 3, 3, 3, 0]],
    ],
    dtype=np.int64,
)[:, None]  # (2, 1, 4, 6)

_P0 = [
    [[1, 0, 0, 0, 1, 1], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 1, 1]],
    [[0, 1, 1, 1, 0, 0], [1, 1, 0, 0, 1, 1], [1, 1, 0, 0, 1, 1], [0, 1, 1, 1, 0, 0]],
    [[0, 0, 0, 0, 0, 0], [0, 0, 1, 1, 0, 0], [0, 0, 1, 1, 0, 0], [0, 0, 0, 0, 0, 0]],
    [[0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]],
]
_P1 = [
    [[1, 0, 0, 0, 0, 1], [1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 1]],
    [[0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 1], [0, 0, 0, 0, 0, 1], [0, 0, 0, 0, 0, 0]],
    [[0, 0, 0, 0, 0.5, 0], [0, 0, 1, 1, 0, 0], [0, 0, 1, 1, 0, 0], [0, 0, 0, 0, 0, 0]],
    [[0, 1, 1, 1, 1.5, 1], [0, 1, 0, 0, 1, 0], [0, 1, 0, 0, 1, 0], [0, 1, 1, 1, 1, 0]],
]
# (2, 4, 4, 6) scaled like the reference's 100 * one-hot-ish predictions.
HAND_PRED = 100.0 * np.array([_P0, _P1], dtype=np.float32)


def random_logits(seed=0, n=2, c=21, h=8, w=9, exits=0, void=21, void_frac=0.15):
    """Random logits + labels with a void fraction; NCHW like the reference.

    Returns (logits, labels): logits (N, C, H, W) or (E, N, C, H, W) when
    ``exits`` > 0; labels (N, H, W) int64 in [0, C) with ~void_frac set to
    ``void``.
    """
    rng = np.random.RandomState(seed)
    shape = (exits, n, c, h, w) if exits else (n, c, h, w)
    logits = rng.randn(*shape).astype(np.float32) * 3.0
    labels = rng.randint(0, c, size=(n, h, w)).astype(np.int64)
    mask = rng.rand(n, h, w) < void_frac
    labels[mask] = void
    return logits, labels


def random_logits_absent(seed=7, n=2, c=6, h=4, w=5, void=6, void_frac=0.2, max_label=3):
    """Random logits where classes >= max_label never occur in the labels —
    discriminates Lovász classes='present' from 'all'."""
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, c, h, w).astype(np.float32) * 3.0
    labels = rng.randint(0, max_label, size=(n, h, w)).astype(np.int64)
    mask = rng.rand(n, h, w) < void_frac
    labels[mask] = void
    return logits, labels


def binary_logits(seed=11, n=3, h=6, w=7, ignore=2, void_frac=0.2):
    """Binary hinge/BCE fixture: logits (N, H, W), labels (N, H, W) in
    {0, 1} with ~void_frac set to ``ignore``."""
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, h, w).astype(np.float32) * 2.0
    labels = rng.randint(0, 2, size=(n, h, w)).astype(np.int64)
    mask = rng.rand(n, h, w) < void_frac
    labels[mask] = ignore
    return logits, labels


def label_maps(seed=13, n=3, c=5, h=6, w=7, ignore=5, void_frac=0.15):
    """Integer prediction/GT label maps for the iou()/iou_binary() helpers."""
    rng = np.random.RandomState(seed)
    preds = rng.randint(0, c, size=(n, h, w)).astype(np.int64)
    labels = rng.randint(0, c, size=(n, h, w)).astype(np.int64)
    mask = rng.rand(n, h, w) < void_frac
    labels[mask] = ignore
    return preds, labels


def random_logits_novoid(seed=1, n=2, c=5, h=6, w=7, exits=0):
    logits, labels = random_logits(seed, n, c, h, w, exits, void=c, void_frac=0.0)
    return logits, labels


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    """(..., C, H, W) -> (..., H, W, C)."""
    return np.moveaxis(x, -3, -1)
