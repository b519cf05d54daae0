"""Real two-process jax.distributed smoke (tools/multihost_smoke.py):
initialize_multihost + global mesh + shard_by_process + one DP train step,
loss bit-identical across processes (the gradient all-reduce proof)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_train_step():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py"),
         "--nprocs", "2"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-500:]
    assert "multihost_smoke: OK (2 processes)" in out.stdout
