#!/usr/bin/env python3
"""Measure compile + run time of the Lovász sort backends (VERDICT r02 #4).

The chunked Pallas sort beats lax.sort standalone at 2^18 but round 2
measured a ~19-minute first compile inside the training step; this tool
bisects where that time goes:

  --what sort      standalone sort_pallas on (B, P) rows
  --what lovasz    per-image Lovász value+grad (the training-loss core)
  --what kernels   the two Mosaic kernels alone (2^16 sort, 2^16 merge)

Usage: python tools/bench_sort_compile.py --what lovasz --p 18 --batch 16
       [--backend pallas|xla]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["sort", "lovasz", "kernels"], default="sort")
    ap.add_argument("--p", type=int, default=18, help="log2 row length")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--backend", choices=["pallas", "xla"], default="pallas")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    os.environ["EE_TPU_LOVASZ_SORT"] = args.backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    P = 1 << args.p
    rng = np.random.RandomState(0)

    def timed(tag, compile_fn, run_fn):
        t0 = time.perf_counter()
        compile_fn()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run_fn()
        tr = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"what": tag, "backend": args.backend,
                          "P": P, "batch": args.batch,
                          "compile_s": round(tc, 1),
                          "run_ms": round(tr * 1e3, 2)}), flush=True)

    if args.what == "sort":
        from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import sort_pallas

        key = jnp.asarray(rng.randn(args.batch, P).astype(np.float32))
        pay = jnp.asarray(rng.randn(args.batch, P).astype(np.float32))
        if args.backend == "pallas":
            fn = jax.jit(lambda k, p: sort_pallas(k, p))
        else:
            fn = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        timed(f"sort_2^{args.p}",
              lambda: float(jnp.sum(fn(key, pay)[0])),
              lambda: float(jnp.sum(fn(key, pay)[0])))
    elif args.what == "lovasz":
        from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_softmax

        H = W = int(P ** 0.5)
        assert H * W == P, "use an even power of two for --p"
        logits = jnp.asarray(
            rng.randn(args.batch, H, W, args.classes).astype(np.float32))
        labels = jnp.asarray(
            rng.randint(0, args.classes + 1, (args.batch, H, W)), jnp.int32)

        fn = jax.jit(jax.value_and_grad(
            lambda x: lovasz_softmax(x, labels, classes="present",
                                     per_image=True, ignore=args.classes)))
        timed(f"lovasz_grad_{H}x{W}",
              lambda: float(fn(logits)[0]),
              lambda: float(fn(logits)[0]))
    else:  # kernels
        from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import (
            _merge_kernel,
            _rowwise_call,
            _sort_kernel,
        )

        R = (1 << 16) // 128
        k3 = jnp.asarray(rng.randn(4, R, 128).astype(np.float32))
        p3 = jnp.asarray(rng.randn(4, R, 128).astype(np.float32))
        interp = jax.default_backend() != "tpu"
        for name, kern in (("sort_kernel", _sort_kernel),
                           ("merge_kernel", _merge_kernel)):
            fn = jax.jit(lambda a, b, kern=kern: _rowwise_call(kern, a, b, interp))
            timed(name,
                  lambda: float(jnp.sum(fn(k3, p3)[0])),
                  lambda: float(jnp.sum(fn(k3, p3)[0])))


if __name__ == "__main__":
    main()
