#!/usr/bin/env python3
"""Bisect the training-step time at 512²: which part is off the roofline?

bench_train measured CE-only 512² b16 at 678 ms/step while the eval
forward runs ~55 ms at that batch — the gap is NOT the Lovász sort (this
config has none), so something in {train-mode forward, full-res loss,
backward, SGD} is far off the roofline.  This times each nesting level as
its own chained-loop single-fetch program (the only honest method through
the tunnel, see CLAUDE.md):

  fwd_eval        model.apply(train=False)           (bench.py's workload)
  fwd_train       model.apply(train=True, mutable)   (+BN batch stats)
  loss_value      CE on a precomputed (E,N,H,W,C) stack
  loss_vjp        CE value+grad wrt the stack
  fwd_loss        loss(fwd(x)) value only
  value_and_grad  d loss / d params (no optimizer)
  full_step       make_train_step (adds SGD + donation)

Usage: python tools/bench_train_step_breakdown.py [--img 512] [--batch 16]
       [--iters 5] [--loss ce|lovasz|both] [--per_image]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--loss", choices=["ce", "lovasz", "both"], default="ce")
    ap.add_argument("--per_image", action="store_true")
    ap.add_argument("--max_present", type=int, default=None,
                    help="Lovász present-class compaction K (train CLI -K)")
    ap.add_argument("--hist_bins", type=int, default=None,
                    help="sort-free histogram Lovász bins (train CLI -G)")
    ap.add_argument("--classes_per_image", type=int, default=None,
                    help="draw labels from this many classes per image "
                         "(real VOC images have 2-5); default all 21")
    ap.add_argument("--only", default=None,
                    help="comma-separated component filter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import build_branchy_deeplabv3
    from ee_semantic_segmentation_tpu.ops.branchy import LovaszSoftmax
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_train_step
    from ee_semantic_segmentation_tpu.train.optim import branchy_lr_multipliers, sgd_momentum

    N, S = args.batch, args.img
    model = build_branchy_deeplabv3(
        depth=50, n=2, img_dim=S, count_branches=False, dtype=jnp.bfloat16
    )
    n_br = model.config.n_branches
    tx = sgd_momentum(multipliers=branchy_lr_multipliers(n_br, 0.01))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.zeros((N, S, S, 3)))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    lovasz = LovaszSoftmax(classes="present", ignore=21, n_branches=n_br,
                           per_image=args.per_image,
                           max_present=args.max_present,
                           hist_bins=args.hist_bins)
    xent = BrXEntropyLoss(ignore_index=21, b_reduction="sum", n_exits=n_br + 1)
    loss_fn = {"ce": xent, "lovasz": lovasz,
               "both": lambda o, l: lovasz(o, l) + 0.1 * xent(o, l)}[args.loss]

    rnp = np.random.RandomState(0)
    images = jnp.asarray(rnp.rand(N, S, S, 3), jnp.float32)
    if args.classes_per_image:
        # each image draws from its own small class palette (VOC-like)
        labels_np = np.empty((N, S, S), np.int32)
        for b in range(N):
            palette = rnp.choice(21, args.classes_per_image, replace=False)
            labels_np[b] = palette[rnp.randint(0, len(palette), (S, S))]
    else:
        labels_np = rnp.randint(0, 21, (N, S, S)).astype(np.int32)
    labels_np[rnp.rand(*labels_np.shape) < 0.03] = 21
    labels = jnp.asarray(labels_np)
    rng = jax.random.PRNGKey(1)

    only = set(args.only.split(",")) if args.only else None
    results = []

    def timeit(name, make_loop, *loop_args):
        if only is not None and name not in only:
            return
        # n is a *dynamic* fori_loop trip count — jitting it static would
        # recompile inside the timed region (first version of this tool did
        # exactly that; fwd_eval "2993 ms" was 5 min of compile / 5 iters).
        loop = jax.jit(make_loop)
        t0 = time.perf_counter()
        float(loop(*loop_args, 1))  # compile + warm
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = float(loop(*loop_args, args.iters))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(v), name
        results.append({"component": name, "ms": round(dt * 1e3, 1),
                        "compile_s": round(compile_s, 1)})
        print(json.dumps(results[-1]), flush=True)

    def tree_scalar(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    # 1. eval forward (bench.py's workload: full-res stacked logits)
    def fwd_eval(v, x, n):
        def body(i, c):
            out = model.apply(v, x + c * 1e-12, train=False)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("fwd_eval", fwd_eval, variables, images)

    # 2. train-mode forward (BN batch stats mutated)
    def fwd_train(v, x, n):
        def body(i, c):
            out, _ = model.apply(v, x + c * 1e-12, train=True,
                                 mutable=["batch_stats"], rngs={"dropout": rng})
            return jnp.sum(out.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("fwd_train", fwd_train, variables, images)

    # 3./4. loss on a precomputed stack.  The (E,N,H,W,C) f32 stack is ~1 GB
    # at 512^2 b16 — only materialize it when a stack stage is requested, and
    # free it afterwards, or the later whole-model stages OOM the chip.
    if only is None or only & {"loss_value", "loss_vjp"}:
        stack = jax.block_until_ready(model.apply(variables, images, train=False))

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
        del stack

    # 5. forward + loss value (no backward)
    def fwd_loss(v, x, lab, n):
        def body(i, c):
            out, _ = model.apply(v, x + c * 1e-12, train=True,
                                 mutable=["batch_stats"], rngs={"dropout": rng})
            return loss_fn(out, lab) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("fwd_loss", fwd_loss, variables, images, labels)

    # 6. value_and_grad wrt params
    def vag(v, x, lab, n):
        def body(i, c):
            def f(params):
                out, _ = model.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    x + c * 1e-12, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                return loss_fn(out, lab)
            loss, grads = jax.value_and_grad(f)(v["params"])
            return tree_scalar(grads) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    timeit("value_and_grad", vag, variables, images, labels)

    # 7. full train step (jit once, loop on host — state threading)
    if only is None or "full_step" in only:
        step = make_train_step(model, loss_fn, tx, donate=False)
        st, m = step(state, images, labels, 0.01)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, m = step(st, images, labels, 0.01)
            _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        results.append({"component": "full_step(host-loop)", "ms": round(dt * 1e3, 1)})
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
