"""Fast pure-function tests: FLOPs math, schedulers, transforms, loader
sharding."""

import numpy as np
import pytest

from ee_semantic_segmentation_tpu import flops as F


def test_conv2d_flops_values():
    # 3x3 conv, 8x8 input, 4->16 channels, stride 1: 8*8*16*4*9 MACs
    assert F.conv2d_flops(8, 8, 4, 16, 3) == 8 * 8 * 16 * 4 * 9
    # stride 2 halves each spatial dim (ceil)
    assert F.conv2d_flops(8, 8, 4, 16, 3, stride=2) == 4 * 4 * 16 * 4 * 9
    # grouped conv divides cin
    assert F.conv2d_flops(8, 8, 16, 16, 3, groups=16) == 8 * 8 * 16 * 1 * 9
    # bias adds one MAC per output element
    assert F.conv2d_flops(4, 4, 1, 2, 1, bias=True) == 4 * 4 * 2 * 1 + 4 * 4 * 2


def test_dense_and_misc_flops():
    assert F.dense_flops(3, 10, 5) == 3 * 10 * 5 + 3 * 5
    assert F.bn_flops(2, 2, 8) == 2 * 2 * 2 * 8
    assert F.pool_flops(4, 4, 2, 3) == 4 * 4 * 2 * 9
    assert F.resize_bilinear_flops(8, 8, 21) == 7 * 8 * 8 * 21


def test_plateau_scheduler_max_mode_and_eps():
    from ee_semantic_segmentation_tpu.train.schedulers import ReduceLROnPlateau

    pl = ReduceLROnPlateau(lr=0.01, factor=0.5, patience=0, mode="max", min_lr=0.004)
    assert pl(1, 0.5) == 0.01         # first value becomes best
    assert pl(2, 0.6) == 0.01         # improvement
    lr3 = pl(3, 0.55)                  # regression -> cut immediately (patience 0)
    assert lr3 == pytest.approx(0.005)
    lr4 = pl(4, 0.5)
    assert lr4 == pytest.approx(0.004)  # clamped at min_lr
    lr5 = pl(5, 0.4)
    assert lr5 == pytest.approx(0.004)  # eps: no micro-updates below min_lr


def test_color_adjust_identities():
    from ee_semantic_segmentation_tpu.data import transforms as T

    rng = np.random.RandomState(0)
    img = rng.rand(6, 6, 3).astype(np.float32)
    np.testing.assert_allclose(T.adjust_brightness(img, 1.0), img, rtol=1e-6)
    np.testing.assert_allclose(T.adjust_contrast(img, 1.0), img, rtol=1e-5)
    np.testing.assert_allclose(T.adjust_saturation(img, 1.0), img, rtol=1e-5)
    np.testing.assert_allclose(T.adjust_hue(img, 0.0), img, atol=1e-5)
    # full hue rotation returns to start
    np.testing.assert_allclose(T.adjust_hue(img, 1.0), img, atol=1e-4)
    # brightness 0 -> black
    assert np.allclose(T.adjust_brightness(img, 0.0), 0.0)


def test_loader_process_sharding(monkeypatch):
    import jax

    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset

    ds = SyntheticSegDataset(size=8, n=10, num_classes=3, void=None)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    dl = DataLoader(ds, batch_size=5, shard_by_process=True)
    # process 1 of 2 sees indices 1,3,5,7,9 -> 5 items -> 1 batch
    assert len(dl) == 1
    batches = list(dl)
    assert batches[0]["count"] == 5

    # both processes together cover the dataset disjointly
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    dl0 = DataLoader(ds, batch_size=5, shard_by_process=True)
    assert len(dl0) == 1


def test_layer_cost_dataclass():
    c = F.LayerCost("conv", 100, 8, 8, 16)
    assert F.accumulate([c, c]) == 200
