"""Param-group semantics: multipliers route LRs per group, zero freezes."""

import numpy as np

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.train.optim import (
    branchy_lr_multipliers,
    label_params,
    sgd_momentum,
)


def _params():
    return {
        "stem": {"conv1": {"kernel": jnp.ones((2, 2))}},
        "block_3": {"conv2": {"kernel": jnp.ones((2, 2))}},
        "branch_0": {"conv": {"kernel": jnp.ones((2, 2))}},
        "branch_1": {"conv": {"kernel": jnp.ones((2, 2))}},
        "classifier": {"conv": {"kernel": jnp.ones((2, 2))}},
    }


def test_label_params_paths():
    p = _params()
    labels = jax.tree_util.tree_map_with_path(lambda path, _: label_params(path), p)
    assert labels["stem"]["conv1"]["kernel"] == "backbone"
    assert labels["block_3"]["conv2"]["kernel"] == "backbone"
    assert labels["branch_0"]["conv"]["kernel"] == "branch_0"
    assert labels["classifier"]["conv"]["kernel"] == "classifier"


def test_group_scaling_and_freezing():
    mult = branchy_lr_multipliers(2, lr=0.01, base_lr=0.005,
                                  freeze_backbone=True, freeze_from=1)
    # backbone frozen, branch_1 frozen (freeze_from=1), branch_0 + classifier live
    tx = sgd_momentum(multipliers=mult, momentum=0.0, weight_decay=0.0)
    params = _params()
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    lr = 0.01
    new = jax.tree.map(lambda p, u: p + lr * u, params, updates)
    assert np.allclose(new["stem"]["conv1"]["kernel"], 1.0)       # frozen
    assert np.allclose(new["block_3"]["conv2"]["kernel"], 1.0)    # frozen
    assert np.allclose(new["branch_1"]["conv"]["kernel"], 1.0)    # frozen
    assert np.allclose(new["branch_0"]["conv"]["kernel"], 1.0 - 0.01)
    assert np.allclose(new["classifier"]["conv"]["kernel"], 1.0 - 0.01)


def test_weight_decay_applies_before_multiplier():
    mult = {"backbone": 1.0, "branch_0": 1.0, "branch_1": 1.0, "classifier": 2.0}
    tx = sgd_momentum(multipliers=mult, momentum=0.0, weight_decay=0.1)
    params = _params()
    grads = jax.tree.map(jnp.zeros_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # update = -(g + wd*p) * mult; with g=0, p=1: backbone -0.1, classifier -0.2
    assert np.allclose(np.asarray(updates["stem"]["conv1"]["kernel"]), -0.1)
    assert np.allclose(np.asarray(updates["classifier"]["conv"]["kernel"]), -0.2)
