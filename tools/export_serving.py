#!/usr/bin/env python3
"""Export a trained checkpoint as a self-contained AOT serving artifact.

Compile-once deployment: the eval forward (or the whole gated early-exit
engine) is lowered to StableHLO with the trained weights baked in and
serialized to ``<out>.stablehlo`` + ``<out>.json`` (see ee/aot.py).  A
server needs only jax and the artifact — no model code, no retrace:

    python tools/export_serving.py -M run/demo -b 8 -o run/demo_serving
    python tools/export_serving.py -M run/demo -b 8 --head gated -t 0.3 \
        -o run/demo_gated

    # serving side
    from ee_semantic_segmentation_tpu.ee.aot import load_exported
    exp = load_exported("run/demo_serving")
    logits = exp.call(images)          # (E, N, H, W, C)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description="Export an AOT serving artifact.")
    p.add_argument("-M", "--model", required=True,
                   help="checkpoint path (with .json config sidecar)")
    p.add_argument("-o", "--out", required=True, help="artifact path prefix")
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--symbolic_batch", action="store_true", default=False,
                   help="export a SYMBOLIC batch dimension: one artifact "
                        "serves any batch size (per-size XLA compiles happen "
                        "lazily at serving time); ignores -b")
    p.add_argument("--head", choices=("logits", "gated"), default="logits",
                   help="'logits': stacked all-exit forward; 'gated': the "
                        "masked early-exit engine (labels + exit index)")
    p.add_argument("-t", "--threshold", type=float, default=0.3,
                   help="gate threshold (gated head)")
    p.add_argument("-m", "--metric", type=str, default="ent",
                   help="gate metric: ent or a similarity name (gated head)")
    p.add_argument("-I", "--skip", type=int, default=0)
    p.add_argument("-c", "--n_classes", type=int, default=21)
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 compute (recommended on TPU)")
    p.add_argument("--platforms", type=str, nargs="+", default=None,
                   help="export platforms (default: current backend + cpu)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.cli.common import load_model
    from ee_semantic_segmentation_tpu.ee.aot import (
        export_eval_forward,
        export_gated,
        save_exported,
    )

    model, state = load_model(
        args.model, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = None if args.symbolic_batch else args.batch_size
    meta = {
        "checkpoint": args.model,
        "head": args.head,
        "batch_size": "symbolic" if batch is None else batch,
        "n_exits": model.config.n_branches + 1,
    }
    if args.head == "gated":
        exp = export_gated(
            model, variables, batch, tau=args.threshold,
            metric=args.metric, skip=args.skip, n_classes=args.n_classes,
            platforms=args.platforms,
        )
        meta.update(tau=args.threshold, metric=args.metric, skip=args.skip)
    else:
        exp = export_eval_forward(
            model, variables, batch, platforms=args.platforms
        )
    path = save_exported(exp, args.out, meta)
    print(f"exported {args.head} head for platforms {list(exp.platforms)} -> {path}")
    return path


if __name__ == "__main__":
    main()
