"""The space-to-depth stem conv is an exact rewrite of the 7x7/2 conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ee_semantic_segmentation_tpu.models.resnet import ResNetStem


@pytest.mark.parametrize("hw", [(32, 32), (64, 96)])
def test_s2d_stem_matches_plain(hw):
    H, W = hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, 3), jnp.float32)

    plain = ResNetStem(dtype=jnp.float32)
    s2d = ResNetStem(dtype=jnp.float32, s2d=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    # identical param tree: the s2d stem consumes the plain stem's params
    y0 = plain.apply(variables, x)
    y1 = s2d.apply(variables, x)
    assert y0.shape == y1.shape == (2, H // 4, W // 4, 64)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-5)


def test_s2d_param_tree_identical():
    x = jnp.zeros((1, 32, 32, 3))
    v0 = ResNetStem().init(jax.random.PRNGKey(0), x)
    v1 = ResNetStem(s2d=True).init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    assert jax.tree.map(lambda a: a.shape, v0) == jax.tree.map(lambda a: a.shape, v1)
