#!/usr/bin/env python3
"""Decompose the 512² per-image Lovász VJP (761 ms at b16, 3 exits) into:

  sort_fwd    sort_pallas on the real workload shape (E*B*C rows of H*W)
  sort_lax    the same rows through lax.sort (2-operand)
  loss_value  lovasz forward only
  loss_vjp    lovasz value+grad wrt the (E,N,H,W,C) stack

Chained-loop single-fetch timing (tunnel-safe, see CLAUDE.md).

Usage: python tools/bench_lovasz_parts.py [--img 512] [--batch 16] [--exits 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--exits", type=int, default=3)
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default=None)
    ap.add_argument("--hist_bins", type=int, default=None,
                    help="also time the sort-free histogram Lovász "
                         "(loss_value_hist / loss_vjp_hist) at this bin count")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ee_semantic_segmentation_tpu.ops.branchy import LovaszSoftmax
    from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import sort_pallas

    E, N, S, C = args.exits, args.batch, args.img, args.classes
    P = S * S
    rows = E * N * C
    only = set(args.only.split(",")) if args.only else None

    rnp = np.random.RandomState(0)
    results = []

    def timeit(name, make_loop, *loop_args):
        if only is not None and name not in only:
            return
        loop = jax.jit(make_loop)
        t0 = time.perf_counter()
        float(loop(*loop_args, 1))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = float(loop(*loop_args, args.iters))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(v), name
        results.append({"component": name, "ms": round(dt * 1e3, 1),
                        "compile_s": round(compile_s, 1)})
        print(json.dumps(results[-1]), flush=True)

    # --- the raw sort at the exact workload shape -------------------------
    key = jnp.asarray(rnp.rand(rows, P), jnp.float32)
    pay = jnp.asarray(rnp.rand(rows, P), jnp.float32)

    def sort_fwd(k, p, n):
        def body(i, c):
            ks, ps = sort_pallas(k + c * 1e-12, p)
            return (jnp.sum(ks[:, :8].astype(jnp.float32))
                    + jnp.sum(ps[:, :8].astype(jnp.float32))) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("sort_fwd", sort_fwd, key, pay)

    def sort_lax(k, p, n):
        def body(i, c):
            ks, ps = jax.lax.sort((k + c * 1e-12, p), num_keys=1)
            return (jnp.sum(ks[:, :8].astype(jnp.float32))
                    + jnp.sum(ps[:, :8].astype(jnp.float32))) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("sort_lax", sort_lax, key, pay)

    del key, pay

    # --- the full loss on a stack -----------------------------------------
    loss_fn = LovaszSoftmax(classes="present", ignore=C, n_branches=E - 1,
                            per_image=True)
    stack = jnp.asarray(rnp.rand(E, N, S, S, C), jnp.float32)
    labels_np = rnp.randint(0, C, (N, S, S)).astype(np.int32)
    labels_np[rnp.rand(*labels_np.shape) < 0.03] = C
    labels = jnp.asarray(labels_np)

    def loss_value(s, lab, n):
        def body(i, c):
            return loss_fn(s + c * 1e-12, lab) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("loss_value", loss_value, stack, labels)

    def loss_vjp(s, lab, n):
        def body(i, c):
            g = jax.grad(lambda ss: loss_fn(ss, lab))(s + c * 1e-12)
            return jnp.sum(g.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("loss_vjp", loss_vjp, stack, labels)

    if args.hist_bins:
        hist_fn = LovaszSoftmax(classes="present", ignore=C, n_branches=E - 1,
                                per_image=True, hist_bins=args.hist_bins)

        def loss_value_hist(s, lab, n):
            def body(i, c):
                return hist_fn(s + c * 1e-12, lab) * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        timeit("loss_value_hist", loss_value_hist, stack, labels)

        def loss_vjp_hist(s, lab, n):
            def body(i, c):
                g = jax.grad(lambda ss: hist_fn(ss, lab))(s + c * 1e-12)
                return jnp.sum(g.astype(jnp.float32)) * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        timeit("loss_vjp_hist", loss_vjp_hist, stack, labels)


if __name__ == "__main__":
    main()
