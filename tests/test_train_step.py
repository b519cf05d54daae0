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


def test_train_step_commits_shardings_without_shard_batch(tiny_setup):
    """make_train_step honors its mesh: feeding HOST numpy arrays (no
    shard_batch pre-commit) still batch-shards inside the program and keeps
    params replicated (VERDICT #8)."""
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
        shard_batch,
    )
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    model = tiny_setup
    mesh = make_mesh()
    tx = sgd_momentum()
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)), mesh=mesh
    )
    loss_obj = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)
    step = make_train_step(model, loss_obj, tx, mesh=mesh)

    rngnp = np.random.RandomState(1)
    images = rngnp.rand(8, 32, 32, 3).astype(np.float32)  # raw numpy
    labels = rngnp.randint(0, 5, (8, 32, 32)).astype(np.int32)
    new_state, metrics = step(state, images, labels, jnp.float32(0.05))
    assert np.isfinite(float(metrics["loss"]))
    assert jax.tree.leaves(new_state.params)[0].sharding.is_fully_replicated

    # identical numerics to the shard_batch pre-committed path
    state2 = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)), mesh=mesh
    )
    b = shard_batch(mesh, {"image": images, "label": labels})
    _, metrics2 = step(state2, b["image"], b["label"], jnp.float32(0.05))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics2["loss"]), rtol=1e-6)


def test_uneven_batch_falls_back_to_replication(tiny_setup):
    """A batch not divisible by the mesh still runs (replicated fallback)."""
    from ee_semantic_segmentation_tpu.parallel import (
        create_train_state,
        make_eval_step,
        make_mesh,
    )
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    model = tiny_setup
    mesh = make_mesh()
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(1), jnp.zeros((8, 32, 32, 3)), mesh=mesh
    )
    fwd = make_eval_step(model, mesh)
    out = fwd(state.params, state.batch_stats, np.zeros((5, 32, 32, 3), np.float32))
    assert out.shape == (2, 5, 32, 32, 5)


def test_shard_by_process_strided_split(monkeypatch):
    """DataLoader(shard_by_process=True) gives each process a disjoint
    strided slice of the SAME global permutation (VERDICT #8)."""
    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset

    ds = SyntheticSegDataset(size=8, n=12, seed=0)

    def indices_for(pid):
        monkeypatch.setattr(jax, "process_index", lambda: pid)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        dl = DataLoader(ds, batch_size=3, shuffle=True, seed=7, shard_by_process=True)
        return list(dl._indices())

    i0, i1 = indices_for(0), indices_for(1)
    assert len(i0) == len(i1) == 6
    assert set(i0).isdisjoint(i1)
    assert sorted(i0 + i1) == list(range(12))


def test_initialize_multihost_raises_on_bad_coordinator(monkeypatch):
    """Explicit multi-host args with a failing init must raise, not silently
    degrade to single-host (VERDICT #8: no swallowed exceptions)."""
    from ee_semantic_segmentation_tpu.parallel.mesh import initialize_multihost

    def boom(**kw):
        raise ValueError("cannot reach coordinator at bogus:1234")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(ValueError, match="coordinator"):
        initialize_multihost(coordinator_address="bogus:1234", num_processes=2, process_id=0)

    # already-initialized RuntimeError is tolerated
    def already(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    mesh = initialize_multihost(coordinator_address="x:1", num_processes=1, process_id=0)
    assert mesh.devices.size >= 1

    # no args + no cluster env: single-host no-op (initialize never called)
    def never(**kw):
        raise AssertionError("should not be called")

    monkeypatch.setattr(jax.distributed, "initialize", never)
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "SLURM_JOB_ID"):
        monkeypatch.delenv(var, raising=False)
    mesh = initialize_multihost()
    assert mesh.devices.size >= 1


class _NoBNBranchy2Exit:
    """Minimal BN-free, dropout-free 2-exit model: accumulation parity must
    be exact (BatchNorm batch stats are the one documented divergence)."""

    def __new__(cls):
        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                h = nn.Conv(8, (3, 3), padding="SAME")(x)
                h = nn.relu(h)
                e1 = nn.Conv(5, (1, 1))(h)
                h = nn.Conv(8, (3, 3), padding="SAME")(h)
                e2 = nn.Conv(5, (1, 1))(nn.relu(h))
                return jnp.stack([e1, e2])

        return M()


def test_grad_accum_exact_parity_without_bn():
    """accum_steps=A must produce the SAME update as the macro batch for
    per-image-mean losses on a BN-free model (grads are linear in the loss;
    mean of micro losses == macro loss)."""
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_train_step
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    model = _NoBNBranchy2Exit()
    tx = sgd_momentum()
    state = create_train_state(model, tx, jax.random.PRNGKey(3), jnp.zeros((4, 16, 16, 3)))
    loss_obj = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)

    rngnp = np.random.RandomState(2)
    images = rngnp.rand(4, 16, 16, 3).astype(np.float32)
    labels = rngnp.randint(0, 5, (4, 16, 16)).astype(np.int32)

    plain = make_train_step(model, loss_obj, tx, donate=False)
    accum = make_train_step(model, loss_obj, tx, donate=False, accum_steps=2)
    s1, m1 = plain(state, images, labels, jnp.float32(0.05))
    s2, m2 = accum(state, images, labels, jnp.float32(0.05))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_grad_accum_on_mesh_trains_and_falls_back(tiny_setup):
    """accum_steps on the 8-device mesh: loss decreases over steps, params
    stay replicated, and a batch not divisible by A uses the plain body."""
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
        shard_batch,
    )
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    model = tiny_setup
    mesh = make_mesh()
    tx = sgd_momentum()
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)), mesh=mesh
    )
    loss_obj = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)
    step = make_train_step(model, loss_obj, tx, mesh=mesh, accum_steps=2)

    rngnp = np.random.RandomState(4)
    images = rngnp.rand(8, 32, 32, 3).astype(np.float32)
    labels = rngnp.randint(0, 5, (8, 32, 32)).astype(np.int32)
    b = shard_batch(mesh, {"image": images, "label": labels})
    losses = []
    for _ in range(4):
        state, m = step(state, b["image"], b["label"], jnp.float32(0.05))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated

    # 5 % 2 != 0 -> plain single-pass body for that trace
    state, m = step(
        state,
        rngnp.rand(5, 32, 32, 3).astype(np.float32),
        rngnp.randint(0, 5, (5, 32, 32)).astype(np.int32),
        jnp.float32(0.05),
    )
    assert np.isfinite(float(m["loss"]))


def test_accum_steps_flag_reaches_dts_info():
    from ee_semantic_segmentation_tpu.cli.main_bradeepv3 import build_parser

    args = build_parser().parse_args(["--accum_steps", "4", "-d", "synthetic"])
    assert args.accum_steps == 4
