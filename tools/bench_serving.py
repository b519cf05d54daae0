#!/usr/bin/env python3
"""Gated-serving throughput benchmark: early-exit savings as real img/s.

Runs the BatchedEarlyExitServer over a synthetic stream at several entropy
thresholds and reports images/sec + realized avg FLOPs/image vs the full
forward — the serving-side counterpart of bench.py's parity forward.

Usage: python tools/bench_serving.py [--img 512] [--n 128] [--batch 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--taus", type=float, nargs="+", default=[0.0, 0.2, 0.4, 1.0])
    args = ap.parse_args()

    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.ee.serving import BatchedEarlyExitServer
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import build_branchy_deeplabv3
    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    import jax

    model = build_branchy_deeplabv3(
        depth=50, n=2, img_dim=args.img, count_branches=False, dtype=jnp.bfloat16
    )
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(0),
        jnp.zeros((1, args.img, args.img, 3)),
    )
    table = model.flops_table(args.img)
    full = sum(table["segments"]) + sum(table["branches"])

    rng = np.random.RandomState(0)
    images = rng.rand(args.n, args.img, args.img, 3).astype(np.float32)

    results = []
    for tau in args.taus:
        srv = BatchedEarlyExitServer(
            model, state.params, state.batch_stats, tau=tau,
            batch_size=args.batch, n_classes=model.config.num_classes,
        )
        # warmup (compiles all stages)
        srv.submit(images[: args.batch])
        srv.flush()
        srv.total_flops = 0.0
        srv._next_uid = 0
        t0 = time.perf_counter()
        srv.submit(images)
        res = srv.flush()
        dt = time.perf_counter() - t0
        exits = np.bincount([r["n"] for r in res.values()], minlength=model.config.n_branches + 2)
        results.append(
            {
                "tau": tau,
                "img_per_sec": round(args.n / dt, 2),
                "avg_flops_frac_of_full": round(srv.avg_flops_per_image / full, 4),
                "exit_histogram": exits[1:].tolist(),
            }
        )
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
