#!/usr/bin/env python3
"""Automated Mosaic full-staging-cliff probe (VERDICT r03 #8 / r04 #7).

The Pallas eval heads are gated to per-kernel pixel envelopes
(``_MAX_PIXELS`` for the confusion kernel, ``_MAX_PIXELS_MAPS`` for the
argmax / entropy+argmax kernels, ops/pallas/upsample_argmax.py) because
above them Mosaic silently stops honoring the row tiling and stages the
FULL (N, H, W) arrays in scoped VMEM.  Those constants are calibrated
against ONE jax/Mosaic version; an image upgrade can invalidate them in
either direction.  This probe makes staleness a command:

* each kernel's BOUNDARY shape (the largest plane inside its envelope) must
  compile, run, and match the XLA reference — if it fails, the constant is
  stale WIDE (shrink it);
* the shape just ABOVE each envelope is compiled with the gate bypassed and
  an OVERFLOW batch (N chosen so a full-staged (N, H, W) int32 output
  CANNOT fit the 16 MB scoped limit — a truly windowed kernel is
  N-oblivious; this round's probe caught exactly this: N=1 at 2^21 pixels
  is only 8 MB and compiles even when mis-staged).  These are expected to
  die in Mosaic's allocator; if one now compiles AND matches, the constant
  is stale NARROW (free eval-head perf — widen it).

Each shape runs in a SUBPROCESS with a timeout (this bug class has included
multi-minute compile hangs) so a hang is a loud per-shape verdict, not a
wedged probe.

Round-5 calibration on this image (v5e): maps kernels verified at 2^20
(1024x1024, N=5 overflow, exact match, 34.3 ms vs tiled-XLA 37.6 ms);
confusion kernel dies at 2^20; everything dies at 2^21.

Exit 0 = both envelope constants still match the installed stack.
Usage: python tools/mosaic_envelope_probe.py   (TPU only; no-op elsewhere)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD_TIMEOUT_S = 600
_VMEM = 16 * (1 << 20)


def child(kernel: str, shape: str) -> int:
    """Compile+run one Pallas eval-head kernel at HxW with the pixel gates
    bypassed and an overflow batch; print MATCH / MISMATCH.  Mosaic errors
    propagate as a nonzero exit (the parent classifies them)."""
    import importlib

    import numpy as np

    import jax
    import jax.numpy as jnp

    # ops.pallas re-exports the upsample_argmax FUNCTION under the module's
    # name — import the module itself to reach/patch its gate constants
    ua = importlib.import_module(
        "ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax")

    H, W = (int(v) for v in shape.split("x"))
    ua._MAX_PIXELS = ua._MAX_PIXELS_MAPS = 1 << 62  # bypass: the probe's point
    h, w = H // 8, W // 8
    # overflow batch: full-staged (N, H, W) int32 output > the scoped limit
    N = max(2, _VMEM // (H * W * 4) + 1)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(N, h, w, 21).astype(np.float32))
    ref_maps = np.asarray(ua.upsample_argmax_reference(logits, (H, W)))

    if kernel == "argmax":
        got = np.asarray(ua.upsample_argmax(logits, (H, W), interpret=False))
        frac = float(np.mean(got != ref_maps))
        extra = 0.0
    elif kernel == "entropy":
        from ee_semantic_segmentation_tpu.ops.gating import norm_entropy

        got, ent = ua.upsample_entropy_argmax(logits, (H, W), interpret=False)
        frac = float(np.mean(np.asarray(got) != ref_maps))
        up = jax.image.resize(logits, (N, H, W, 21), method="bilinear")
        ent_ref = jax.vmap(lambda p: norm_entropy(p, 21))(
            jax.nn.softmax(up, axis=-1))
        extra = float(np.max(np.abs(np.asarray(ent) - np.asarray(ent_ref))))
    elif kernel == "confusion":
        from ee_semantic_segmentation_tpu.ops.metrics import confusion_counts

        labels = jnp.asarray(rng.randint(0, 22, (N, H, W)).astype(np.int32))
        got = np.asarray(ua.upsample_argmax_confusion(
            logits, labels, N, (H, W), interpret=False))
        tp, fp, fn = confusion_counts(jnp.asarray(ref_maps), labels, 21)
        ref = np.asarray(jnp.stack([tp.sum(0), fp.sum(0), fn.sum(0)]))
        frac = float(np.max(np.abs(got - ref)) / max(float(ref.max()), 1.0))
        extra = 0.0
    else:
        raise SystemExit(f"unknown kernel {kernel}")

    print(f"probe {kernel}@{shape} N={N}: mismatch={frac:.2e} extra={extra:.2e}")
    if frac > 1e-4 or extra > 1e-3:
        print("MISMATCH")
        return 1
    print("MATCH")
    return 0


def run_probe(kernel: str, shape: str):
    """-> 'match' | 'mismatch' | 'error' | 'hang'."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", kernel, shape],
            capture_output=True, text=True, timeout=CHILD_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return "hang", f"no verdict within {CHILD_TIMEOUT_S}s (Mosaic hang)"
    tail = "\n".join((out.stdout + out.stderr).strip().splitlines()[-3:])
    if out.returncode == 0 and "MATCH" in out.stdout:
        return "match", tail
    if "MISMATCH" in out.stdout:
        return "mismatch", tail
    return "error", tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=2, metavar=("KERNEL", "SHAPE"),
                    default=None)
    args = ap.parse_args()
    if args.child:
        return child(*args.child)

    import importlib

    import jax

    ua = importlib.import_module(
        "ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax")

    if jax.default_backend() != "tpu":
        print("mosaic_envelope_probe: no TPU backend — skipping (Mosaic "
              "staging behavior only exists on hardware)")
        return 0

    # boundary shapes use the VERIFIED orientations (W also matters to
    # Mosaic's lane tiling): maps kernels at 1024x(mp/1024), confusion at
    # 512x(mc/512); "above" doubles the pixel count keeping H=1024
    mp, mc = ua._MAX_PIXELS_MAPS, ua._MAX_PIXELS
    plan = [
        ("argmax", "_MAX_PIXELS_MAPS",
         f"1024x{mp // 1024}", f"1024x{2 * mp // 1024}"),
        ("entropy", "_MAX_PIXELS_MAPS",
         f"1024x{mp // 1024}", f"1024x{2 * mp // 1024}"),
        ("confusion", "_MAX_PIXELS",
         f"512x{mc // 512}", f"1024x{2 * mc // 1024}"),
    ]

    stale = []
    for kernel, const, boundary, above in plan:
        verdict, tail = run_probe(kernel, boundary)
        print(f"[{kernel:9s} boundary {boundary}] {verdict}: {tail.splitlines()[0] if tail else ''}")
        if verdict != "match":
            stale.append(
                f"{kernel} boundary {boundary} no longer works ({verdict}) — "
                f"{const} is stale WIDE: shrink it "
                "(ops/pallas/upsample_argmax.py)"
            )
        verdict, tail = run_probe(kernel, above)
        print(f"[{kernel:9s} above    {above}] {verdict}: {tail.splitlines()[0] if tail else ''}")
        if verdict == "match":
            stale.append(
                f"{kernel} above-envelope {above} now compiles and matches — "
                f"{const} is stale NARROW: re-verify with this probe's "
                "overflow-N method and widen (free eval-head perf)"
            )

    if stale:
        for s in stale:
            print(f"STALE: {s}")
        return 1
    print("mosaic_envelope_probe: OK — per-kernel envelopes match the "
          "installed jax/Mosaic")
    return 0


if __name__ == "__main__":
    sys.exit(main())
