"""Resume semantics: start_from restores weights + best-value tracking
(train_funcs.py:99-109 equivalent)."""

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
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    mesh = make_mesh()
    train_ds = SyntheticSegDataset(size=32, n=16, num_classes=5, void=5, seed=0)
    val_ds = SyntheticSegDataset(size=32, n=8, num_classes=5, void=5, seed=1)
    tx = sgd_momentum()
    loss = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)
    step = make_train_step(tiny_model, loss, tx, mesh=mesh)

    def fresh_state():
        return create_train_state(
            tiny_model, tx, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)), mesh=mesh
        )

    return dict(
        model=tiny_model, mesh=mesh, step=step, fresh_state=fresh_state,
        train_loader=DataLoader(train_ds, 8, shuffle=True),
        val_loader=DataLoader(val_ds, 8),
    )


def test_resume_restores_best_value(setup, tmp_path):
    from ee_semantic_segmentation_tpu.train.trainer import train

    state, tracker, saved = train(
        setup["model"], setup["fresh_state"](), setup["step"], setup["train_loader"],
        num_epochs=2, mesh=setup["mesh"], val_loader=setup["val_loader"],
        n_exits=2, nout_channels=5, patience=10, saveat=str(tmp_path),
        save_name="r", lr=0.05, minimize=False, config=setup["model"].config,
    )
    assert saved is not None
    best = max(
        np.mean([tracker["val_mIoU_b1_mIoU"][i], tracker["val_mIoU_mIoU"][i]])
        for i in range(2)
    )

    # resume: a fresh run starting from the checkpoint must carry best_val
    # forward — epoch 1 of the resumed run should NOT save unless it improves
    state2, tracker2, saved2 = train(
        setup["model"], setup["fresh_state"](), setup["step"], setup["train_loader"],
        num_epochs=1, mesh=setup["mesh"], val_loader=setup["val_loader"],
        n_exits=2, nout_channels=5, patience=10, saveat=str(tmp_path / "second"),
        save_name="r2", start_from=saved, lr=0.05, minimize=False,
        config=setup["model"].config,
    )
    cur = np.mean([tracker2["val_mIoU_b1_mIoU"][0], tracker2["val_mIoU_mIoU"][0]])
    if cur <= best:
        assert saved2 is None
    else:
        assert saved2 is not None
