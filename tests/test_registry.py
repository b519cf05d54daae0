"""Registry smoke: every loss/metric factory instantiates and evaluates."""

import numpy as np
import pytest

import jax.numpy as jnp

from ee_semantic_segmentation_tpu import registry as R


def _single(c=4):
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 6, 5, c).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, (2, 6, 5)))
    return logits, labels


def _multi(c=4, e=3):
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(e, 2, 6, 5, c).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, (2, 6, 5)))
    return logits, labels


SINGLE_EXIT = [
    "FocalLoss", "FocalLoss_sum", "JaccardLoss", "JaccardLoss_sum",
    "JaccardLoss_sum_dg", "TverskyLoss", "TverskyLoss_sum",
    "FocalTverskyLoss", "FocalTverskyLoss_sum", "HybridFocal",
    "LovaszSoftmax", "LovaszSoftmax_ignore",
]
MULTI_EXIT = ["BSL_Focal", "BSL_Jaccard", "BSL_Tversky", "BSL_FocalTversky",
              "BSL_Lovasz", "BrXEntropy"]


@pytest.mark.parametrize("name", SINGLE_EXIT)
def test_seg_losses_single(name):
    loss = R.seg_losses[name]()
    logits, labels = _single()
    v = loss(logits, labels)
    assert np.isfinite(np.asarray(v)).all(), name


@pytest.mark.parametrize("name", MULTI_EXIT)
def test_seg_losses_multi(name):
    loss = R.seg_losses[name]()
    if hasattr(loss, "update_n"):
        loss.update_n(2)
    logits, labels = _multi()
    v = loss(logits, labels)
    assert np.isfinite(np.asarray(v)).all(), name


def test_generic_losses():
    logits, labels = _single()
    assert np.isfinite(float(R.get_loss["x_entropy"]()(logits, labels)))
    a = jnp.ones((3, 4))
    b = jnp.zeros((3, 4))
    assert float(R.get_loss["MSE"]()(a, b)) == pytest.approx(1.0)
    assert float(R.get_loss["L1"]()(a, b)) == pytest.approx(1.0)
    assert float(R.get_loss["S_L1"]()(a, b)) == pytest.approx(0.5)


@pytest.mark.parametrize("name", ["F1", "F2", "F.5", "Dice", "Jaccard",
                                  "accuracy", "precision", "recall"])
def test_metrics(name):
    m = R.get_metric[name]()
    logits, labels = _single()
    v = m(logits, labels)
    assert np.isfinite(np.asarray(v)).all(), name


def test_initializers_and_acts():
    import jax

    for name, factory in R.get_initializer.items():
        init = factory()
        # dirac (delta_orthogonal) needs a conv-shaped (rank>=3) tensor
        shape = (3, 3, 4, 4) if name == "dirac" else (4, 4)
        w = init(jax.random.PRNGKey(0), shape, jnp.float32)
        assert w.shape == shape, name
    x = jnp.linspace(-2, 2, 9)
    for name, f in R.act_funcs.items():
        assert np.isfinite(np.asarray(f(x))).all(), name


def test_conv_blks_registry_and_blocks():
    """conv_blks/get_mod/get_conv (module_variables.py:26-37,135-139):
    every block builds, runs in train mode (BN mutable), and produces the
    expected channels-last shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ee_semantic_segmentation_tpu import registry as R

    blks = R._conv_blks()
    assert set(blks) == {"InvertedResidual", "InceptionBlk", "CIncepBlk",
                         "HDConvBlk", "WaveBlk"}
    mods = R._get_mod()
    assert {"DenseLayer", "ConvLayer"} <= set(mods) and set(blks) <= set(mods)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 6), jnp.float32)
    want_c = {"InvertedResidual": 16, "InceptionBlk": 16, "CIncepBlk": 16 + 6,
              "HDConvBlk": 16, "WaveBlk": 16}
    want_hw = {"WaveBlk": (4, 4)}
    for name, cls in blks.items():
        m = cls(features=16)
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
        H, W = want_hw.get(name, (8, 8))
        assert y.shape == (2, H, W, want_c[name]), (name, y.shape)
        assert bool(jnp.all(jnp.isfinite(y))), name

    # rank-n conv factories
    for rank, key in ((1, "1d"), (2, "2d"), (3, "3d")):
        conv = R.get_conv[key](4, kernel_size=3)
        xi = jnp.zeros((2,) + (8,) * rank + (3,))
        v = conv.init(jax.random.PRNGKey(0), xi)
        assert conv.apply(v, xi).shape == (2,) + (8,) * rank + (4,)
