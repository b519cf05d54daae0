"""Lockstep torch-vs-JAX TRAINING parity (VERDICT r02 #1).

Thin pytest wrapper over tools/lockstep_parity.py, which runs the
reference's OWN torch train path (train_funcs.train_epoch + the
deepv3_funcs.py:74-101 optimizer groups + the reference losses) against our
``make_train_step`` from identical initial weights on identical batches —
in float64, in a subprocess (``jax_enable_x64`` is process-global and must
not leak into the rest of the suite).

Why x64: measured on this model, one-step f64 gradients agree to ~1e-11
relative across frameworks, while f32 gradients differ by up to ~4% purely
from BatchNorm cancellation noise (same math both sides), which SGD then
amplifies ~1.8x/step — f32 trajectories diverge chaotically by step ~5 with
no semantic difference.  f64 isolates semantics, so the tolerances here are
TIGHT: any drift in loss numerics, gradients, momentum, weight decay, or
LR-group mapping fails loudly.

Known, documented divergence: the reference trains with ASPP Dropout(0.5)
active; dropout is disabled on both sides here (framework RNG streams
cannot be aligned) — a stochastic, not semantic, difference (PARITY.md).
"""

import json
import os
import subprocess
import sys

import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _run(loss: str, steps: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lockstep_parity.py"),
         "--loss", loss, "--steps", str(steps)],
        capture_output=True, text=True, timeout=2400, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_lockstep_ce():
    """BrXEntropyLoss (main_bradeepv3_ce.py:121 config): 3 SGD steps of the
    reference's own train loop track ours step-for-step.

    Measured envelope: loss rel ~1e-9, worst param leaf rel ~1.6e-5, delta
    cos 1-1e-10.  Tolerances sit 100x above; real semantic drift (a wrong
    LR group, a missed weight-decay term) starts at ~1e-3 and fails hard.
    Beyond ~4 steps cross-framework lockstep is physically impossible even
    at f64: a ~1e-9 param difference flips a max-pool routing and the
    trajectories separate discontinuously."""
    r = _run("ce", steps=3)
    assert r["max_loss_rel"] < 1e-7, r
    assert r["worst_param_rel"] < 1e-3, r
    assert r["worst_delta_cos"] > 1 - 1e-6, r


@pytest.mark.slow
def test_lockstep_lovasz():
    """Branchy LovaszSoftmax (classes='present', ignore=void, per-batch —
    the main_bradeepv3.py:121 config).

    The vendored Berman code hard-casts to f32 (lovaszsoftmax.py:25-27), so
    the loss boundary runs at f32 on both sides (see lockstep_parity.py).
    Measured: per-step losses bit-identical through 2 steps; worst param
    leaf rel 1.8e-4 (f32 rounding of the loss gradient), delta cos 1-2e-8.
    The Lovász gradient depends on the sort ORDER of the errors, so its
    chaos horizon is shorter than CE's — 2 steps is the lockstep window."""
    r = _run("lovasz", steps=2)
    assert r["max_loss_rel"] < 1e-6, r
    assert r["worst_param_rel"] < 5e-3, r
    assert r["worst_delta_cos"] > 1 - 1e-5, r
