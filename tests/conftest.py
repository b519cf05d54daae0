"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this executes
at conftest import time (pytest loads conftest before test modules).
"""

import os

# Env must be set before jax initializes its backends.  NOTE: the TPU plugin
# in this image ("axon") ignores the JAX_PLATFORMS *env var*, so the config
# update below (after import) is what actually forces CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import json
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

# Persistent compilation cache: XLA CPU compiles are slow in this image
# (~10-20 s per fresh conv); cache them across pytest runs.
_CACHE = "/tmp/jax_compile_cache"
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

_GOLDEN = pathlib.Path(__file__).parent / "golden" / "reference_values.json"


@pytest.fixture(scope="session")
def golden():
    """Expected values produced from the reference implementation by
    tools/gen_golden.py (data fixtures, not code)."""
    with open(_GOLDEN) as fh:
        return json.load(fh)


@pytest.fixture(scope="session")
def tiny_model():
    """One shared tiny branchy model (1 branch, 5 classes, 32px) so every
    test file reuses the same compiled programs via the persistent cache."""
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )

    cfg = BranchyConfig(
        backbone_depth=50, img_dim=32, n_branches=1, segment_ends=(3,),
        branch_channels=(256,), num_classes=5,
    )
    return BranchyDeepLabV3(config=cfg)


@pytest.fixture(scope="session")
def tiny_state(tiny_model):
    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    tx = sgd_momentum()
    return create_train_state(
        tiny_model, tx, jax.random.PRNGKey(7), jnp.zeros((8, 32, 32, 3))
    )
