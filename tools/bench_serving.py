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
    ap.add_argument("--engine", choices=["queue", "masked", "both"], default="both",
                    help="queue = host-side compaction pipeline (ee/serving), "
                         "masked = single-program lax.cond engine (ee/masked)")
    ap.add_argument("--pallas_head", action="store_true", default=False,
                    help="masked engine computes branch gates + label maps "
                         "with the fused Pallas upsample+entropy+argmax head")
    ap.add_argument("--sharpen", type=float, default=8.0,
                    help="scale branch-head classifier kernels so the "
                         "random-weight model produces confident (low-"
                         "entropy) exits — exercises mid-tau gating honestly "
                         "(exit histograms are reported)")
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
    if args.sharpen != 1.0:
        params = jax.tree_util.tree_map_with_path(
            lambda path, p: p * args.sharpen
            if any(getattr(k, "key", None) == "classifier" for k in path)
            and getattr(path[-1], "key", None) == "kernel"
            else p,
            state.params,
        )
        state = state.replace(params=params)
    table = model.flops_table(args.img)
    full = sum(table["segments"]) + sum(table["branches"])

    rng = np.random.RandomState(0)
    images = rng.rand(args.n, args.img, args.img, 3).astype(np.float32)

    if args.engine in ("masked", "both"):
        from ee_semantic_segmentation_tpu.ee.masked import (
            gated_flops_per_image,
            make_masked_gated_scan,
        )

        var = {"params": state.params, "batch_stats": state.batch_stats}
        S = args.n // args.batch
        xs = jnp.asarray(images[: S * args.batch]).reshape(
            S, args.batch, args.img, args.img, 3
        )

        # full-forward baseline with the same one-dispatch scan timing.
        # argmax ALL exits (not just the last) so XLA cannot dead-code the
        # branch heads — this is the ungated all-exits serving workload.
        def full_fwd(xs):
            def step(c, x):
                out = model.apply(var, x, train=False)
                maps = jnp.argmax(out, axis=-1).astype(jnp.int32)  # (E,N,H,W)
                # reduce every exit's map so none is dead code
                return c, jnp.sum(maps, axis=(1, 2, 3))

            return jax.lax.scan(step, 0, xs)[1]

        full_jit = jax.jit(full_fwd)
        int(jnp.sum(full_jit(xs)[-1, -1]))  # warmup; scalar fetch (the
        # tunnel's block_until_ready does not actually wait — CLAUDE.md)
        t0 = time.perf_counter()
        lab = full_jit(xs)
        anchor = int(jnp.sum(lab[-1, -1]))  # small fetch forces completion
        dt_full = time.perf_counter() - t0
        print(json.dumps({"engine": "full_forward",
                          "img_per_sec": round(S * args.batch / dt_full, 2)}),
              flush=True)

        for tau in args.taus:
            fn = make_masked_gated_scan(
                model, var, tau=tau, n_classes=model.config.num_classes,
                pallas_head=args.pallas_head,
            )
            w0, w1 = fn(xs)
            int(jnp.sum(w0[-1, -1])) + int(w1[-1, -1])  # warmup scalar fetch
            t0 = time.perf_counter()
            labels, exits = fn(xs)
            anchor = int(jnp.sum(labels[-1, -1])) + int(exits[-1, -1])
            dt = time.perf_counter() - t0
            exits_np = np.asarray(exits).ravel()
            hist = np.bincount(exits_np, minlength=model.config.n_branches + 2)
            counts = {int(e): int(c) for e, c in enumerate(hist) if c}
            print(json.dumps({
                "engine": "masked",
                "tau": tau,
                "img_per_sec": round(S * args.batch / dt, 2),
                "speedup_vs_full": round(dt_full / dt, 3),
                "avg_flops_frac_of_full": round(
                    gated_flops_per_image(model, counts, img_dim=args.img) / full, 4),
                "exit_histogram": hist[1:].tolist(),
            }), flush=True)

    if args.engine == "masked":
        return

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
