#!/usr/bin/env python3
"""Eval-path throughput: fused forward+confusion program, XLA head vs the
Pallas upsample+argmax head (VERDICT #6 / roadmap item #4).

Both run the eval_mIoU.py workload (multi-exit forward -> per-exit confusion
counts) on the default device with chained-iteration single-fetch timing.

Usage: python tools/bench_eval.py [--img 512] [--batch 16] [--iters 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, nargs="+", default=[512],
                    help="square side, or H W (e.g. --img 512 1024)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.ee.batch_eval import (
        make_fused_miou_step_fn,
        make_pallas_miou_step_fn,
    )
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import build_branchy_deeplabv3

    dims = args.img if len(args.img) > 1 else args.img[0]
    model = build_branchy_deeplabv3(
        depth=50, n=2, img_dim=dims, count_branches=False, dtype=jnp.bfloat16
    )
    H, W = model.config.img_hw
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False
    )
    params, stats = variables["params"], variables.get("batch_stats", {})

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(args.batch, H, W, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 21, (args.batch, H, W)), jnp.int32)

    for name, mk in (("xla_head", make_fused_miou_step_fn),
                     ("pallas_head", make_pallas_miou_step_fn)):
        step = mk(model, 21)

        @jax.jit
        def loop(params, stats, images, labels, n, step=step):
            def body(i, carry):
                x = images + carry * 1e-12
                conf = step(params, stats, x, labels, images.shape[0])
                return jnp.sum(conf) * 1e-9

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(params, stats, images, labels, 1))  # compile + warm
        t0 = time.perf_counter()
        v = float(loop(params, stats, images, labels, args.iters))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        print(json.dumps({
            "metric": f"eval_{H}x{W}_images_per_sec_per_chip",
            "head": name,
            "value": round(args.batch * args.iters / dt, 2),
            "unit": "images/sec",
        }), flush=True)


if __name__ == "__main__":
    main()
