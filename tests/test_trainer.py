"""End-to-end trainer tests on synthetic data (tiny model, CPU mesh)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup(tiny_model):
    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_mesh, make_train_step
    from ee_semantic_segmentation_tpu.train.optim import branchy_lr_multipliers, sgd_momentum

    mesh = make_mesh()
    train_ds = SyntheticSegDataset(size=32, n=16, num_classes=5, void=5, seed=0)
    val_ds = SyntheticSegDataset(size=32, n=8, num_classes=5, void=5, seed=1)
    train_loader = DataLoader(train_ds, batch_size=8, shuffle=True)
    val_loader = DataLoader(val_ds, batch_size=8)

    tx = sgd_momentum(multipliers=branchy_lr_multipliers(1, lr=0.05))
    state = create_train_state(
        tiny_model, tx, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)), mesh=mesh
    )
    loss = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)
    step = make_train_step(tiny_model, loss, tx, mesh=mesh)
    return dict(model=tiny_model, mesh=mesh, state=state, step=step,
                train_loader=train_loader, val_loader=val_loader)


def test_train_loop_converges_and_checkpoints(setup, tmp_path):
    from ee_semantic_segmentation_tpu.train.trainer import train
    from ee_semantic_segmentation_tpu.train.schedulers import PolynomialLR

    msg_file = str(tmp_path / "msgs.txt")
    state, tracker, saved = train(
        setup["model"], setup["state"], setup["step"], setup["train_loader"],
        num_epochs=3, mesh=setup["mesh"], val_loader=setup["val_loader"],
        n_exits=2, nout_channels=5, patience=10, saveat=str(tmp_path),
        save_name="tiny", verbose=True, use_file=msg_file,
        scheduler=PolynomialLR(0.05, 3), lr=0.05, minimize=False,
        config=setup["model"].config,
    )
    assert len(tracker["train_loss"]) == 3
    assert tracker["train_loss"][-1] < tracker["train_loss"][0]
    assert "val_mIoU_b1_mIoU" in tracker and "val_mIoU_mIoU" in tracker
    assert saved is not None
    assert os.path.exists(saved + ".json")
    # message-file logging happened
    content = open(msg_file).read()
    assert "progress update" in content and "training epoch" in content
    # LR followed the polynomial schedule
    assert tracker["lr"][0] == pytest.approx(0.05)
    assert tracker["lr"][1] < 0.05


def test_checkpoint_roundtrip_and_resume(setup, tmp_path):
    from ee_semantic_segmentation_tpu.train import checkpoint as ckpt

    # The jitted train step donates its input state (buffers deleted), so the
    # fixture's state may be consumed by the previous test — build fresh.
    import jax as _jax
    import jax.numpy as _jnp

    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    state = create_train_state(
        setup["model"], sgd_momentum(), _jax.random.PRNGKey(3), _jnp.zeros((8, 32, 32, 3))
    )
    path = ckpt.save_checkpoint(str(tmp_path), "rt", state, setup["model"].config,
                                {"val_mIoU": 0.5})
    # mutate then restore
    zeroed = state.replace(params=jax.tree.map(jnp.zeros_like, state.params))
    restored, extra = ckpt.load_checkpoint(path, zeroed)
    assert extra["val_mIoU"] == 0.5
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    cfg = ckpt.load_config(path)
    assert cfg == setup["model"].config

    # components-restricted restore (eval path): params land even when the
    # destination opt_state structure differs from the saved one
    import optax

    from ee_semantic_segmentation_tpu.parallel import create_train_state

    other_state = create_train_state(
        setup["model"], optax.sgd(0.1), jax.random.PRNGKey(9), jnp.zeros((8, 32, 32, 3))
    )
    partial, _ = ckpt.load_checkpoint(path, other_state, components=("params", "batch_stats"))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(partial.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
