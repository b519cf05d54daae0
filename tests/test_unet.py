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
