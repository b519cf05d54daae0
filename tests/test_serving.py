"""Batched early-exit serving engine tests (tiny model, CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def server_args(tiny_model, tiny_state):
    return tiny_model, tiny_state.params, tiny_state.batch_stats


def _images(n, seed=0):
    return np.random.RandomState(seed).rand(n, 32, 32, 3).astype(np.float32)


def test_all_exit_early(server_args):
    from ee_semantic_segmentation_tpu.ee.serving import BatchedEarlyExitServer

    model, params, stats = server_args
    srv = BatchedEarlyExitServer(model, params, stats, tau=2.0, batch_size=4,
                                 n_classes=5)
    uids = srv.submit(_images(10))
    res = srv.flush()
    assert set(res) == set(uids)
    assert all(r["n"] == 1 for r in res.values())
    assert all(r["label_map"].shape == (32, 32) for r in res.values())
    # only stage 0 should have run
    assert srv.stage_runs[0] > 0 and srv.stage_runs[1] == 0
    table = model.flops_table(32)
    full = sum(table["segments"]) + table["branches"][0] + table["branches"][-1]
    assert srv.avg_flops_per_image < full


def test_none_exit_early(server_args):
    from ee_semantic_segmentation_tpu.ee.serving import BatchedEarlyExitServer

    model, params, stats = server_args
    srv = BatchedEarlyExitServer(model, params, stats, tau=-1.0, batch_size=4,
                                 n_classes=5)
    srv.submit(_images(6))
    res = srv.flush()
    assert all(r["n"] == model.config.n_branches + 1 for r in res.values())
    assert srv.stage_runs[-1] > 0


def test_partial_batches_flush(server_args):
    from ee_semantic_segmentation_tpu.ee.serving import BatchedEarlyExitServer

    model, params, stats = server_args
    srv = BatchedEarlyExitServer(model, params, stats, tau=-1.0, batch_size=8,
                                 n_classes=5)
    srv.submit(_images(3))  # less than one batch
    res = srv.flush()
    assert len(res) == 3


def test_matches_sequential_runner(server_args):
    """Server exit decisions must agree with the per-image sequential engine."""
    from ee_semantic_segmentation_tpu.ee.sequential import EarlyExitRunner
    from ee_semantic_segmentation_tpu.ee.serving import BatchedEarlyExitServer

    model, params, stats = server_args
    tau = 0.9
    imgs = _images(5, seed=3)
    runner = EarlyExitRunner(model, params, stats, metric="ent", threshold=tau,
                             n_classes=5, img_dim=32)
    seq = [runner(imgs[i]) for i in range(len(imgs))]

    srv = BatchedEarlyExitServer(model, params, stats, tau=tau, batch_size=5,
                                 n_classes=5)
    uids = srv.submit(imgs)
    res = srv.flush()
    for i, uid in enumerate(uids):
        assert res[uid]["n"] == seq[i]["n"]
        np.testing.assert_array_equal(res[uid]["label_map"], seq[i]["exit"])


def test_serving_stats_and_deferred_maps(tiny_model, tiny_state):
    """Round-3 double-buffered scheduler: stats() reports runs/occupancy/
    waves, and deferred label-map materialization returns every result."""
    from ee_semantic_segmentation_tpu.ee.serving import BatchedEarlyExitServer

    images = np.random.RandomState(0).rand(10, 32, 32, 3).astype(np.float32)
    server = BatchedEarlyExitServer(
        tiny_model, tiny_state.params, tiny_state.batch_stats,
        tau=0.97, batch_size=4, n_classes=5,
    )
    server.submit(images)
    res = server.flush()
    assert len(res) == 10
    s = server.stats()
    assert s["stage_runs"][0] >= 3  # 10 images / B=4 -> >= 3 stage-0 runs
    assert 0 < s["occupancy"] <= 1
    assert s["waves"] >= 1 and s["mean_wave"] >= 1
    assert s["avg_flops_per_image"] > 0
