"""On-device masked gated-inference engine (ee/masked.py, VERDICT #5):
agreement with the per-image sequential engine, scan-variant equivalence,
threshold extremes, and gated-FLOPs pricing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ee_semantic_segmentation_tpu.ee.masked import (
    gated_flops_per_image,
    make_masked_gated_apply,
    make_masked_gated_scan,
)
from ee_semantic_segmentation_tpu.ee.sequential import EarlyExitRunner


@pytest.fixture(scope="module")
def images():
    return np.random.RandomState(3).rand(8, 32, 32, 3).astype(np.float32)


def test_masked_matches_sequential_engine(tiny_model, tiny_state, images):
    """Same exits and identical label maps as the host-side sequential
    engine (the reference's ee_dnn_op_ne.py semantics) at a mid threshold."""
    tau = 0.97  # random weights -> high entropy; pick a tau that splits
    fn = make_masked_gated_apply(
        tiny_model,
        {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats},
        tau=tau, n_classes=5,
    )
    labels, exits = fn(jnp.asarray(images))
    labels, exits = np.asarray(labels), np.asarray(exits)

    runner = EarlyExitRunner(
        tiny_model, tiny_state.params, tiny_state.batch_stats,
        metric="ent", threshold=tau, n_classes=5,
    )
    for i in range(images.shape[0]):
        out = runner(images[i])
        assert exits[i] == out["n"], i
        np.testing.assert_array_equal(labels[i], out["exit"])


def test_masked_threshold_extremes(tiny_model, tiny_state, images):
    var = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    # tau=inf: everyone exits at branch 1
    _, exits = make_masked_gated_apply(tiny_model, var, tau=np.inf, n_classes=5)(
        jnp.asarray(images)
    )
    assert np.all(np.asarray(exits) == 1)
    # tau=-inf: nobody gates out, all reach the final classifier
    lab, exits = make_masked_gated_apply(tiny_model, var, tau=-np.inf, n_classes=5)(
        jnp.asarray(images)
    )
    assert np.all(np.asarray(exits) == tiny_model.config.n_branches + 1)
    # final labels match the full forward's last exit argmax
    full = tiny_model.apply(var, jnp.asarray(images), train=False)
    np.testing.assert_array_equal(
        np.asarray(lab), np.asarray(jnp.argmax(full[-1], axis=-1))
    )
    # skip >= n_branches also forces the final exit
    _, exits = make_masked_gated_apply(
        tiny_model, var, tau=np.inf, n_classes=5, skip=1
    )(jnp.asarray(images))
    assert np.all(np.asarray(exits) == tiny_model.config.n_branches + 1)


def test_masked_pallas_head_matches(tiny_model, tiny_state, images):
    """pallas_head=True produces the same exits and labels at the threshold
    extremes (gate entropies match the XLA path to ~1e-6; labels exactly)."""
    var = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    for tau in (np.inf, -np.inf):
        lab_x, ex_x = make_masked_gated_apply(tiny_model, var, tau=tau, n_classes=5)(
            jnp.asarray(images)
        )
        lab_p, ex_p = make_masked_gated_apply(
            tiny_model, var, tau=tau, n_classes=5, pallas_head=True
        )(jnp.asarray(images))
        np.testing.assert_array_equal(np.asarray(ex_x), np.asarray(ex_p))
        np.testing.assert_array_equal(np.asarray(lab_x), np.asarray(lab_p))


def test_masked_scan_matches_per_batch(tiny_model, tiny_state, images):
    """The one-dispatch lax.scan variant returns exactly the per-micro-batch
    results."""
    var = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    tau = 0.97
    per = make_masked_gated_apply(tiny_model, var, tau=tau, n_classes=5)
    xs = jnp.asarray(images).reshape(2, 4, 32, 32, 3)
    labels_s, exits_s = make_masked_gated_scan(tiny_model, var, tau=tau, n_classes=5)(xs)
    for s in range(2):
        l, e = per(xs[s])
        np.testing.assert_array_equal(np.asarray(labels_s[s]), np.asarray(l))
        np.testing.assert_array_equal(np.asarray(exits_s[s]), np.asarray(e))


def test_gated_flops_pricing(tiny_model):
    """Exit-count pricing agrees with the analytic table at the extremes and
    is monotone in exit depth."""
    table = tiny_model.flops_table()
    n = tiny_model.config.n_branches
    all_first = gated_flops_per_image(tiny_model, {1: 10})
    all_last = gated_flops_per_image(tiny_model, {n + 1: 10})
    assert all_first == pytest.approx(table["segments"][0] + table["branches"][0])
    # final exit pays every segment, every gated branch head, and the head
    assert all_last == pytest.approx(
        sum(table["segments"]) + sum(table["branches"]))
    assert all_first < all_last
    mixed = gated_flops_per_image(tiny_model, {1: 5, n + 1: 5})
    assert all_first < mixed < all_last


@pytest.fixture(scope="module")
def sim_model_state():
    """3-exit model (2 branches) — the similarity gate needs a previous exit
    to compare against, so 1-branch models never fire it."""
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )
    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    cfg = BranchyConfig(
        backbone_depth=50, img_dim=32, n_branches=2, segment_ends=(2, 4),
        branch_channels=(256, 256), num_classes=5,
    )
    model = BranchyDeepLabV3(config=cfg)
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(1), jnp.zeros((4, 32, 32, 3))
    )
    return model, state


@pytest.mark.parametrize("metric,taus", [
    ("mse", (0.5, 2.0, 1e9)),
    ("ssim", (0.3, 0.8)),
    ("nmi", (1.2, 1.6)),
])
def test_masked_similarity_matches_sequential(sim_model_state, images, metric, taus):
    """VERDICT r02 #7: the masked engine's similarity gate agrees with the
    per-image sequential engine (ee_dnn_op.py:84-94 semantics) exit-for-exit
    and pixel-for-pixel."""
    from ee_semantic_segmentation_tpu.ops.gating import SIM_GREATER

    model, state = sim_model_state
    var = {"params": state.params, "batch_stats": state.batch_stats}
    for tau in taus:
        fn = make_masked_gated_apply(
            model, var, tau=tau, n_classes=5, metric=metric,
            sim_ignore=(4,),
        )
        labels, exits = fn(jnp.asarray(images))
        labels, exits = np.asarray(labels), np.asarray(exits)

        runner = EarlyExitRunner(
            model, state.params, state.batch_stats,
            metric=metric, threshold=tau,
            less_than=metric not in SIM_GREATER,
            n_classes=5, sim_ignore=(4,), img_dim=32,
        )
        for i in range(images.shape[0]):
            out = runner(images[i])
            assert exits[i] == out["n"], (metric, tau, i)
            np.testing.assert_array_equal(labels[i], out["exit"])


def test_masked_similarity_skip(sim_model_state, images):
    """skip=1 leaves only branch 2 gated; it merely seeds the reference map,
    so every image must reach the final classifier."""
    model, state = sim_model_state
    var = {"params": state.params, "batch_stats": state.batch_stats}
    fn = make_masked_gated_apply(
        model, var, tau=1e9, n_classes=5, metric="mse", skip=1,
    )
    _, exits = fn(jnp.asarray(images))
    assert np.all(np.asarray(exits) == model.config.n_branches + 1)


def test_gated_flops_exclude_first_branch(tiny_model):
    """The `_2` pricing drops exactly the first evaluated branch head."""
    table = tiny_model.flops_table()
    n = tiny_model.config.n_branches
    full = gated_flops_per_image(tiny_model, {n + 1: 3})
    no_first = gated_flops_per_image(tiny_model, {n + 1: 3},
                                     exclude_first_branch=True)
    assert full - no_first == pytest.approx(table["branches"][0])
