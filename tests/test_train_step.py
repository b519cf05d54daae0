"""Optimizer parity vs torch SGD + sharded train-step tests on the 8-device
CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sgd_matches_torch():
    """Our chain (wd -> trace -> scale) applied as p + lr*u must track
    torch.optim.SGD(momentum=.9, weight_decay=5e-4) bit-for-bit-ish."""
    import torch

    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(4)]
    lr, mom, wd = 0.05, 0.9, 5e-4

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = sgd_momentum(momentum=mom, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + lr * u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_lr_multipliers_reference_groups():
    from ee_semantic_segmentation_tpu.train.optim import branchy_lr_multipliers

    m = branchy_lr_multipliers(n_branches=3, lr=0.01, base_lr=0.005)
    assert m["backbone"] == pytest.approx(0.5)
    assert m["branch_0"] == m["branch_1"] == m["branch_2"] == 1.0
    assert m["classifier"] == pytest.approx(1.1)

    m = branchy_lr_multipliers(n_branches=3, lr=0.01, freeze_backbone=True, freeze_from=1)
    assert m["backbone"] == 0.0
    assert m["branch_0"] == 1.0 and m["branch_1"] == 0.0 and m["branch_2"] == 0.0
    assert m["classifier"] == 1.0

    m = branchy_lr_multipliers(n_branches=3, lr=0.01, weighted_lr=True)
    w = np.linspace(1.0, 1.2, 3)
    assert m["branch_0"] == pytest.approx(w[0])
    assert m["branch_1"] == pytest.approx(w[1])
    assert m["branch_2"] == 0.0  # reference leaves the last branch unoptimized
    assert m["classifier"] == pytest.approx(w[2])


def test_schedulers():
    from ee_semantic_segmentation_tpu.train.schedulers import PolynomialLR, ReduceLROnPlateau

    sched = PolynomialLR(lr=0.01, num_epochs=10)
    assert sched(0) == pytest.approx(0.01)
    assert sched(5) == pytest.approx(0.01 * 0.5**0.9)
    # min_lr horizon: lr at num_epochs stays >= min_lr
    sched = PolynomialLR(lr=0.01, num_epochs=10, min_lr=0.001)
    assert sched(10) >= 0.001 * 0.99

    pl = ReduceLROnPlateau(lr=0.01, factor=0.75, patience=1, mode="max")
    lrs = [pl(i, m) for i, m in enumerate([0.5, 0.5, 0.5, 0.5])]
    assert lrs[0] == 0.01 and lrs[-1] < 0.01


@pytest.fixture(scope="module")
def tiny_setup(tiny_model):
    return tiny_model


def test_dp_train_step_on_mesh(tiny_setup):
    """Full sharded train step on the virtual 8-device mesh; loss decreases
    and params stay replicated."""
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
        shard_batch,
    )
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum, branchy_lr_multipliers

    model = tiny_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8

    mult = branchy_lr_multipliers(n_branches=1, lr=0.01)
    tx = sgd_momentum(multipliers=mult)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((8, 32, 32, 3))
    state = create_train_state(model, tx, rng, sample, mesh=mesh)

    loss_obj = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)
    step = make_train_step(model, loss_obj, tx, mesh=mesh)

    rngnp = np.random.RandomState(0)
    images = rngnp.rand(8, 32, 32, 3).astype(np.float32)
    labels = rngnp.randint(0, 5, (8, 32, 32)).astype(np.int32)
    batch = shard_batch(mesh, {"image": images, "label": labels})

    losses = []
    for _ in range(6):
        state, metrics = step(state, batch["image"], batch["label"], jnp.float32(0.05))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # params replicated across the mesh
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_eval_step_shapes(tiny_setup):
    from ee_semantic_segmentation_tpu.parallel import make_eval_step, make_mesh, shard_batch
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum
    from ee_semantic_segmentation_tpu.parallel import create_train_state

    model = tiny_setup
    mesh = make_mesh()
    tx = sgd_momentum()
    state = create_train_state(model, tx, jax.random.PRNGKey(1), jnp.zeros((8, 32, 32, 3)), mesh=mesh)
    fwd = make_eval_step(model, mesh)
    images = shard_batch(mesh, np.zeros((8, 32, 32, 3), np.float32))
    out = fwd(state.params, state.batch_stats, images)
    assert out.shape == (2, 8, 32, 32, 5)
