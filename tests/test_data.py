"""Data pipeline tests: transforms, split parity, loader semantics."""

import numpy as np
import pytest

from ee_semantic_segmentation_tpu.data.loader import DataLoader, LoadDataset
from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset
from ee_semantic_segmentation_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    SegTransform,
    TargetTransform,
    salt_and_pepper,
)
from ee_semantic_segmentation_tpu.data.voc import split_val_test


def test_seg_transform_normalizes_array():
    arr = np.full((8, 8, 3), 0.5, np.float32)
    out = SegTransform(8)(arr)
    expect = (0.5 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[0, 0], expect, rtol=1e-6)


def test_target_transform_void_remap():
    t = np.array([[0, 5], [255, 20]], np.uint8)
    out = TargetTransform(2)(t)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [[0, 5], [21, 20]])


def test_seg_transform_pil_resize_crop():
    PIL = pytest.importorskip("PIL.Image")
    img = PIL.new("RGB", (100, 60), (128, 128, 128))
    out = SegTransform(32)(img)
    assert out.shape == (32, 32, 3)
    tgt = PIL.new("P", (100, 60))
    t_out = TargetTransform(32)(tgt)
    assert t_out.shape == (32, 32)


def test_salt_and_pepper_fraction():
    rng = np.random.default_rng(0)
    img = np.full((100, 100, 3), 0.5, np.float32)
    out = salt_and_pepper(img, rng, amount=0.1, prop=0.5)
    changed = np.any(out != 0.5, axis=-1).mean()
    assert 0.05 < changed < 0.15
    assert set(np.unique(out)) <= {0.0, 0.5, 1.0}


def test_split_val_test_matches_torch_random_split():
    torch = pytest.importorskip("torch")
    from torch.utils.data import random_split

    n = 50
    val_idx, test_idx = split_val_test(n, seed=42)
    torch.manual_seed(42)
    val_size = int(0.4 * n)
    val_set, test_set = random_split(list(range(n)), [val_size, n - val_size])
    assert val_idx == list(val_set.indices)
    assert test_idx == list(test_set.indices)


def test_loader_shapes_and_padding():
    ds = SyntheticSegDataset(size=16, n=10, num_classes=5, void=5)
    dl = DataLoader(ds, batch_size=4, pad_final=True)
    batches = list(dl)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (4, 16, 16, 3)
        assert b["label"].shape == (4, 16, 16)
    assert batches[-1]["count"] == 2  # 10 = 4 + 4 + 2 padded to 4

    dl = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(list(dl)) == 2


def test_loader_shuffle_deterministic_per_epoch():
    ds = SyntheticSegDataset(size=8, n=8, num_classes=3, void=None)
    a = DataLoader(ds, batch_size=8, shuffle=True, seed=1)
    b = DataLoader(ds, batch_size=8, shuffle=True, seed=1)
    x1 = next(iter(a))["image"]
    x2 = next(iter(b))["image"]
    np.testing.assert_array_equal(x1, x2)
    # next epoch differs
    x3 = next(iter(a))["image"]
    assert not np.array_equal(x1, x3)


def test_load_dataset_facade_synthetic():
    hand = LoadDataset(16, None, None)
    train, val, test = hand.get_dataset(None, "synthetic")
    assert len(train) and len(val) and len(test)
    img, lab = train.get(0)
    assert img.shape == (16, 16, 3) and lab.shape == (16, 16)
    with pytest.raises(ValueError):
        hand.get_dataset(None, "nonexistent")


def test_synthetic_deterministic():
    a = SyntheticSegDataset(size=16, n=4, seed=3).get(1)
    b = SyntheticSegDataset(size=16, n=4, seed=3).get(1)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
