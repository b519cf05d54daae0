"""Early-exit engine tests: batched evaluators + sequential runner."""

import numpy as np
import pytest

import jax.numpy as jnp

from ee_semantic_segmentation_tpu.ee.batch_eval import (
    br_evaluator_entropy,
    br_evaluator_similarity,
    mIoU_evaluator,
)


class _Batches:
    """Minimal loader over prebuilt batches."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def _perfect_forward(n_exits, n_classes):
    """Mock forward: logits one-hot on the ground-truth labels (per batch the
    label array is stashed on the loader batch)."""

    def f_from(labels):
        oh = np.eye(n_classes, dtype=np.float32)[np.clip(labels, 0, n_classes - 1)] * 10.0
        return np.broadcast_to(oh, (n_exits,) + oh.shape).copy()

    return f_from


def _batches(n_imgs=6, n_classes=4, hw=8, seed=0, void=None):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, n_classes, (n_imgs, hw, hw))
    if void is not None:
        labels[rng.rand(*labels.shape) < 0.1] = void
    images = rng.rand(n_imgs, hw, hw, 3).astype(np.float32)
    out = []
    for i in range(0, n_imgs, 3):
        out.append({"image": images[i : i + 3], "label": labels[i : i + 3], "count": 3})
    return out


def test_miou_evaluator_perfect_predictions():
    n_classes, n_exits = 4, 3
    batches = _batches(n_classes=n_classes)
    make = _perfect_forward(n_exits, n_classes)
    labels_by_id = {id(b["image"]): b["label"] for b in batches}

    def forward(images):
        return make(labels_by_id[id(images)])

    res = mIoU_evaluator(forward, n_exits, n_classes, _Batches(batches))
    assert res["mIoU"] == pytest.approx(1.0)
    assert res["b1_mIoU"] == pytest.approx(1.0)
    assert set(res) == {"b1_mIoU", "b2_mIoU", "mIoU"}


def test_entropy_evaluator_threshold_extremes():
    n_classes, n_exits = 4, 3
    batches = _batches(n_classes=n_classes)
    make = _perfect_forward(n_exits, n_classes)
    labels_by_id = {id(b["image"]): b["label"] for b in batches}

    def forward(images):
        return make(labels_by_id[id(images)])

    # tau = 1.0: one-hot*10 logits have near-zero entropy -> everyone exits at b1
    res = br_evaluator_entropy(forward, n_exits, n_classes, _Batches(batches), tau=1.0)
    assert res["b1_count"] == 6 and res["count_out"] == 0
    assert res["out_gl"] == 6
    assert res["mIoU_gl"] == pytest.approx(1.0)

    # tau = -1: nobody exits -> all at the final head
    res = br_evaluator_entropy(forward, n_exits, n_classes, _Batches(batches), tau=-1.0)
    assert res["b1_count"] == 0 and res["b2_count"] == 0 and res["count_out"] == 6

    # skip=1: branch 0 disabled even with tau=1
    res = br_evaluator_entropy(forward, n_exits, n_classes, _Batches(batches), tau=1.0, skip=1)
    assert res["b1_count"] == 0 and res["b2_count"] == 6


def test_similarity_evaluator():
    n_classes, n_exits = 4, 4
    batches = _batches(n_classes=n_classes)
    make = _perfect_forward(n_exits, n_classes)
    labels_by_id = {id(b["image"]): b["label"] for b in batches}

    def forward(images):
        return make(labels_by_id[id(images)])

    # identical exits -> MSE = 0 < tau -> exit at the first gated position (b2)
    res = br_evaluator_similarity(forward, n_exits, n_classes, _Batches(batches), "mse", tau=0.5)
    assert res["b2_count"] == 6 and res["count_out"] == 0
    assert res["mIoU_gl"] == pytest.approx(1.0)

    # ssim gate: identical maps have ssim=1 > tau -> also exits at b2
    res = br_evaluator_similarity(forward, n_exits, n_classes, _Batches(batches), "ssim", tau=0.9)
    assert res["b2_count"] == 6

    # impossible mse threshold -> final head
    res = br_evaluator_similarity(forward, n_exits, n_classes, _Batches(batches), "mse", tau=-1.0)
    assert res["count_out"] == 6

    # image-level accumulators path
    res = br_evaluator_similarity(
        forward, n_exits, n_classes, _Batches(batches), "mse", tau=0.5, image_level=True
    )
    assert res["b2_count"] == 6 and res["mIoU_gl"] == pytest.approx(1.0)


def test_fused_miou_matches_two_step(tiny_model, tiny_state):
    """Fused forward+confusion evaluator == forward-then-evaluate path."""
    from ee_semantic_segmentation_tpu.ee.batch_eval import (
        mIoU_evaluator,
        mIoU_evaluator_fused,
    )
    from ee_semantic_segmentation_tpu.parallel import make_eval_step

    rng = np.random.RandomState(7)
    batches = [
        {"image": rng.rand(4, 32, 32, 3).astype(np.float32),
         "label": rng.randint(0, 5, (4, 32, 32)), "count": c}
        for c in (4, 3)  # second batch padded
    ]
    fwd = make_eval_step(tiny_model)

    def forward(images):
        return fwd(tiny_state.params, tiny_state.batch_stats, jnp.asarray(images))

    two_step = mIoU_evaluator(forward, 2, 5, _Batches(batches))
    fused = mIoU_evaluator_fused(tiny_model, tiny_state, 2, 5, _Batches(batches))
    for k in two_step:
        assert fused[k] == pytest.approx(two_step[k], rel=1e-6), k


def test_sequential_runner(tiny_model, tiny_state):
    from ee_semantic_segmentation_tpu.ee.sequential import EarlyExitRunner

    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)

    # entropy gate with tau so large everything exits at branch 1
    r = EarlyExitRunner(
        tiny_model, tiny_state.params, tiny_state.batch_stats,
        metric="ent", threshold=2.0, n_classes=5, img_dim=32,
    )
    out = r(img)
    assert out["n"] == 1
    assert out["exit"].shape == (32, 32)
    assert out["exit_flops"] < out["last_flops"]
    assert out["edge_flops"] == out["exit_flops"]
    assert "last" in out and out["last"].shape == (32, 32)

    # tau below 0: never exits -> final head, exit == last
    r = EarlyExitRunner(
        tiny_model, tiny_state.params, tiny_state.batch_stats,
        metric="ent", threshold=-1.0, n_classes=5, img_dim=32,
    )
    out = r(img)
    assert out["n"] == tiny_model.config.n_branches + 1
    np.testing.assert_array_equal(out["exit"], out["last"])
    assert out["exit_flops"] == out["last_flops"]

    # similarity gate with 1 branch: never has a reference -> never exits
    r = EarlyExitRunner(
        tiny_model, tiny_state.params, tiny_state.batch_stats,
        metric="mse", threshold=1e9, n_classes=5, img_dim=32,
    )
    out = r(img)
    assert out["n"] == tiny_model.config.n_branches + 1


def test_sequential_flops_match_table(tiny_model, tiny_state):
    from ee_semantic_segmentation_tpu.ee.sequential import EarlyExitRunner

    table = tiny_model.flops_table(32)
    r = EarlyExitRunner(
        tiny_model, tiny_state.params, tiny_state.batch_stats,
        metric="ent", threshold=2.0, n_classes=5, img_dim=32,
    )
    out = r(np.zeros((32, 32, 3), np.float32))
    # exit at branch 1: flops = segment0 + branch0 = cumulative_exits[0]
    assert out["exit_flops"] == pytest.approx(table["cumulative_exits"][0])
    assert out["last_flops"] == pytest.approx(
        sum(table["segments"]) + table["branches"][0] + table["branches"][-1]
    )


def test_fused_entropy_evaluator_matches(tiny_model, tiny_state):
    """Fused entropy-gated evaluator == forward-then-evaluate path."""
    from ee_semantic_segmentation_tpu.ee.batch_eval import (
        br_evaluator_entropy,
        br_evaluator_entropy_fused,
    )
    from ee_semantic_segmentation_tpu.parallel import make_eval_step

    rng = np.random.RandomState(11)
    batches = [
        {"image": rng.rand(4, 32, 32, 3).astype(np.float32),
         "label": rng.randint(0, 6, (4, 32, 32)), "count": c}
        for c in (4, 2)
    ]
    fwd = make_eval_step(tiny_model)

    def forward(images):
        return fwd(tiny_state.params, tiny_state.batch_stats, jnp.asarray(images))

    for tau in (0.5, 2.0, -1.0):
        a = br_evaluator_entropy(forward, 2, 5, _Batches(batches), tau)
        b = br_evaluator_entropy_fused(tiny_model, tiny_state, 2, 5, _Batches(batches), tau)
        for k in a:
            if isinstance(a[k], float) and np.isnan(a[k]):
                assert np.isnan(b[k]), (tau, k)
            else:
                assert b[k] == pytest.approx(a[k], rel=1e-6), (tau, k)


def test_fused_similarity_evaluator_matches(tiny_model, tiny_state):
    """Fused similarity-gated evaluator == two-step path (needs >= 2 branch
    positions, so use a 3-exit hand config sharing tiny shapes)."""
    from ee_semantic_segmentation_tpu.ee.batch_eval import (
        br_evaluator_similarity,
        br_evaluator_similarity_fused,
    )
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_eval_step
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    import jax

    cfg = BranchyConfig(
        backbone_depth=50, img_dim=32, n_branches=2, segment_ends=(2, 4),
        branch_channels=(256, 256), num_classes=5,
    )
    model = BranchyDeepLabV3(config=cfg)
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(1), jnp.zeros((4, 32, 32, 3))
    )
    rng = np.random.RandomState(13)
    batches = [
        {"image": rng.rand(4, 32, 32, 3).astype(np.float32),
         "label": rng.randint(0, 5, (4, 32, 32)), "count": c}
        for c in (4, 3)
    ]
    fwd = make_eval_step(model)

    def forward(images):
        return fwd(state.params, state.batch_stats, jnp.asarray(images))

    for metric, tau in (("mse", 1e9), ("mse", -1.0), ("ssim", 0.0)):
        a = br_evaluator_similarity(forward, 3, 5, _Batches(batches), metric, tau)
        b = br_evaluator_similarity_fused(model, state, 3, 5, _Batches(batches), metric, tau)
        for k in a:
            va = a[k]
            if isinstance(va, float) and np.isnan(va):
                assert np.isnan(b[k]), (metric, tau, k)
            else:
                assert b[k] == pytest.approx(va, rel=1e-6), (metric, tau, k)
