"""U-Net / BranchyUNet / AE family: shapes + one optimization step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_unet_shapes():
    from ee_semantic_segmentation_tpu.models.unet import UNet

    m = UNet(num_classes=5, widths=(8, 16, 32))
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 32, 32, 5)


def test_branchy_unet_shapes_and_losses():
    from ee_semantic_segmentation_tpu.models.unet import BranchyUNet
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss

    m = BranchyUNet(num_classes=5, widths=(8, 16, 32))
    assert m.n_branches == 1
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 2, 32, 32, 5)  # (E, N, H, W, C)

    labels = jnp.zeros((2, 32, 32), jnp.int32)
    loss = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)
    val = float(loss(out, labels))
    assert np.isfinite(val)


def test_ae_reconstruction_step():
    from ee_semantic_segmentation_tpu.models.unet import AE

    m = AE(widths=(8, 16))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    # one SGD step on reconstruction MSE reduces the loss
    import optax

    def loss_fn(params):
        y, updates = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean((y - x) ** 2)

    tx = optax.sgd(0.5)
    params = v["params"]
    opt = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(5):
        g = jax.grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0


def test_net_consts_registry():
    from ee_semantic_segmentation_tpu.registry import _net_consts

    consts = _net_consts()
    assert set(consts) == {"UNet", "EUNet", "AE", "branchy_unet"}


def test_ae_train_path_converges():
    """ae_train (train_funcs.py:37-58 equivalent): loss decreases over 3
    epochs of reconstruction training on synthetic images (VERDICT #9)."""
    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset
    from ee_semantic_segmentation_tpu.models.unet import AE
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_mesh
    from ee_semantic_segmentation_tpu.registry import get_loss
    from ee_semantic_segmentation_tpu.train.ae import ae_train, make_ae_train_step
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    model = AE(widths=(8, 16))
    mesh = make_mesh()
    tx = sgd_momentum()
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)), mesh=mesh
    )
    step = make_ae_train_step(model, get_loss["MSE"](), tx, mesh=mesh)
    loader = DataLoader(SyntheticSegDataset(size=16, n=16, seed=3), batch_size=8)
    state, metrics = ae_train(
        model, state, step, loader, num_epochs=3, mesh=mesh, lr=0.5
    )
    assert len(metrics) == 3
    assert metrics[-1] < metrics[0], metrics


def test_ae_denoising_transform():
    """The optional input transform corrupts the net input while the loss
    target stays clean (train_funcs.py:46-47 semantics)."""
    from ee_semantic_segmentation_tpu.models.unet import AE
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_mesh
    from ee_semantic_segmentation_tpu.registry import get_loss
    from ee_semantic_segmentation_tpu.train.ae import make_ae_train_step
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    model = AE(widths=(8, 16))
    mesh = make_mesh()
    tx = sgd_momentum()
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)), mesh=mesh
    )

    def noisy(x, rng):
        return x + 0.1 * jax.random.normal(rng, x.shape)

    step = make_ae_train_step(model, get_loss["MSE"](), tx, mesh=mesh, transform=noisy)
    x = np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)
    state, m = step(state, jnp.asarray(x), jnp.float32(0.1))
    assert np.isfinite(float(m["loss"]))
