"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ee_semantic_segmentation_tpu.ops.gating import batched_norm_entropy
from ee_semantic_segmentation_tpu.ops.metrics import confusion_update
from ee_semantic_segmentation_tpu.ops.pallas import (
    batched_entropy_pallas,
    confusion_pallas,
)


def test_entropy_kernel_matches_jnp():
    rng = np.random.RandomState(0)
    stacked = rng.randn(2, 3, 16, 24, 21).astype(np.float32) * 2.0
    ref = np.asarray(batched_norm_entropy(jnp.asarray(stacked), 21))
    got = np.asarray(batched_entropy_pallas(jnp.asarray(stacked), 21, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_entropy_kernel_nonmultiple_pixels():
    rng = np.random.RandomState(1)
    # H*W = 15*13 = 195, not a multiple of the 512-pixel tile
    stacked = rng.randn(1, 2, 15, 13, 5).astype(np.float32)
    ref = np.asarray(batched_norm_entropy(jnp.asarray(stacked), 5))
    got = np.asarray(batched_entropy_pallas(jnp.asarray(stacked), 5, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_confusion_kernel_matches_jnp():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 17, 19, 21).astype(np.float32)
    labels = rng.randint(0, 22, (2, 17, 19)).astype(np.int32)  # incl. void 21
    ref = np.asarray(confusion_update(jnp.asarray(logits), jnp.asarray(labels), num_classes=21))
    got = np.asarray(confusion_pallas(jnp.asarray(logits), jnp.asarray(labels), 21, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_confusion_kernel_void_fp_semantics():
    logits = np.zeros((1, 1, 2, 3), np.float32)
    logits[0, 0, :, 2] = 5.0
    labels = np.array([[[2, 3]]], np.int32)
    out = np.asarray(confusion_pallas(jnp.asarray(logits), jnp.asarray(labels), 3, interpret=True))
    assert out[0, 2] == 1.0  # TP
    assert out[1, 2] == 1.0  # void pixel counted as FP for predicted class
    assert out[2].sum() == 0.0
