"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this executes
at conftest import time (pytest loads conftest before test modules).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import json
import pathlib

import pytest

_GOLDEN = pathlib.Path(__file__).parent / "golden" / "reference_values.json"


@pytest.fixture(scope="session")
def golden():
    """Expected values produced from the reference implementation by
    tools/gen_golden.py (data fixtures, not code)."""
    with open(_GOLDEN) as fh:
        return json.load(fh)
