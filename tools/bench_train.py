#!/usr/bin/env python3
"""Training-step throughput: full fused step (fwd + Lovász/CE + bwd + SGD).

Measures the driver config #3/#4 style workload (multi-exit training) on the
default device, with the same loop-fused single-fetch timing as bench.py.

Usage: python tools/bench_train.py [--img 512] [--batch 16] [--iters 5]
       [--loss ce|lovasz|both] [--remat]
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
    ap.add_argument("--width", type=int, default=None,
                    help="image width for non-square (default: --img)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--loss", choices=["ce", "lovasz", "both"], default="both")
    ap.add_argument("--per_image", action="store_true",
                    help="per-image Lovász (the -P train CLI path)")
    ap.add_argument("--max_present", type=int, default=None,
                    help="Lovász present-class compaction K (the -K train "
                         "CLI path): sort only the K most frequent present "
                         "classes")
    ap.add_argument("--hist_bins", type=int, default=None,
                    help="SORT-FREE histogram Lovász with this many error "
                         "buckets (the -G train CLI path); approximate, "
                         "replaces the per-class sort with MXU histograms")
    ap.add_argument("--classes_per_image", type=int, default=None,
                    help="synthetic labels drawn from this many classes per "
                         "image instead of all 21 (real VOC images have "
                         "2-5) — makes --max_present exact AND shows its "
                         "win; default keeps all-classes-present labels")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--accum_steps", type=int, default=1,
                    help="gradient accumulation micro-steps inside the "
                         "jitted step (peak HBM ~ batch/accum_steps; lets "
                         "full-res run effective batches past the b2 "
                         "single-chip envelope)")
    ap.add_argument("--n_branches", type=int, default=2,
                    help="branch count (exits = n+1); driver config #3 is "
                         "a 4-exit model -> --n_branches 3")
    ap.add_argument("--n_classes", type=int, default=21,
                    help="21 = VOC (+void 21), 19 = Cityscapes (+void 19)")
    ap.add_argument("--accumulate", action="store_true",
                    help="accumulate the loss on device and fetch ONCE at "
                         "the end (the trainer's round-3 epoch-loop "
                         "behavior) instead of a per-step scalar fetch — "
                         "measures the host-sync overhead VERDICT r02 #6 "
                         "removed")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import build_branchy_deeplabv3
    from ee_semantic_segmentation_tpu.ops.branchy import LovaszSoftmax
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_train_step
    from ee_semantic_segmentation_tpu.train.optim import branchy_lr_multipliers, sgd_momentum

    W = args.width or args.img
    img_dim = args.img if W == args.img else (args.img, W)
    C = args.n_classes
    model = build_branchy_deeplabv3(
        depth=50, n=args.n_branches, img_dim=img_dim, count_branches=False,
        num_classes=C, dtype=jnp.bfloat16,
    )
    if args.remat:
        model = model.clone(remat=True)
    n_br = model.config.n_branches
    tx = sgd_momentum(multipliers=branchy_lr_multipliers(n_br, 0.01))
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((args.batch, args.img, W, 3)),
    )

    lovasz = LovaszSoftmax(classes="present", ignore=C, n_branches=n_br,
                           per_image=args.per_image,
                           max_present=args.max_present,
                           hist_bins=args.hist_bins)
    xent = BrXEntropyLoss(ignore_index=C, b_reduction="sum", n_exits=n_br + 1)
    if args.loss == "ce":
        loss_fn = xent
    elif args.loss == "lovasz":
        loss_fn = lovasz
    else:
        loss_fn = lambda out, lab: lovasz(out, lab) + 0.1 * xent(out, lab)

    step = make_train_step(model, loss_fn, tx, donate=False,
                           accum_steps=args.accum_steps)

    rnp = np.random.RandomState(0)
    images = jnp.asarray(rnp.rand(args.batch, args.img, W, 3), jnp.float32)
    if args.classes_per_image:
        # each image draws from its own small class palette (VOC-like)
        labels_np = np.empty((args.batch, args.img, W), np.int32)
        for b in range(args.batch):
            palette = rnp.choice(C, args.classes_per_image, replace=False)
            labels_np[b] = palette[rnp.randint(0, len(palette), (args.img, W))]
    else:
        labels_np = rnp.randint(0, C, (args.batch, args.img, W)).astype(np.int32)
    labels_np[rnp.rand(*labels_np.shape) < 0.03] = C
    labels = jnp.asarray(labels_np)

    # Plain sequential steps with a scalar fetch each (forces completion;
    # a loop-fused program compiles impractically slowly on remote backends).
    state, m = step(state, images, labels, jnp.float32(0.01))
    float(m["loss"])  # compile + warm
    t0 = time.perf_counter()
    if args.accumulate:
        acc = None
        for _ in range(args.iters):
            state, m = step(state, images, labels, jnp.float32(0.01))
            acc = m["loss"] if acc is None else acc + m["loss"]
        v = float(acc)  # single fetch forces completion of the whole chain
    else:
        v = 0.0
        for _ in range(args.iters):
            state, m = step(state, images, labels, jnp.float32(0.01))
            v = float(m["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    print(
        json.dumps(
            {
                "metric": f"train_{args.img}x{W}_images_per_sec_per_chip",
                "value": round(args.batch * args.iters / dt, 2),
                "unit": "images/sec",
                "loss": args.loss,
                "remat": args.remat,
                "accumulate": args.accumulate,
                "accum_steps": args.accum_steps,
                "max_present": args.max_present,
                "hist_bins": args.hist_bins,
                "classes_per_image": args.classes_per_image,
                "n_branches": n_br,
                "n_classes": C,
            }
        )
    )


if __name__ == "__main__":
    main()
