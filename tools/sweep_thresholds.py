#!/usr/bin/env python3
"""Early-exit threshold sweep: tau grid -> gated mIoU + mean FLOPs/image.

The driver's config #5 workload ("exit-threshold grid + eval_flops/
eval_br_sim profiling"): for each tau, run the fused gated evaluator and
combine its exit histogram with the analytic per-exit FLOPs table into the
accuracy/compute trade-off curve — one CSV row per (metric, tau).

Usage:
  python tools/sweep_thresholds.py -M <ckpt> -d synthetic -D 32 -c 21 \
      -m ent --taus 0.2 0.4 0.6 0.8 [--sim-metric mse --sim-taus ...]
"""

import argparse
import json
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def sweep(model, state, loader, n_classes, metric, taus, *, skip=0):
    """-> list of row dicts with mIoU_gl, exit histogram, mean FLOPs/img."""
    from ee_semantic_segmentation_tpu.ee.batch_eval import (
        br_evaluator_entropy_fused,
        br_evaluator_similarity_fused,
    )

    n_exits = model.config.n_branches + 1
    table = model.flops_table()
    per_exit_flops = table["cumulative_exits"]  # exit i cost; last = full path
    full_flops = sum(table["segments"]) + table["branches"][-1]

    rows = []
    for tau in taus:
        if metric in ("ent", "max", "min"):
            res = br_evaluator_entropy_fused(
                model, state, n_exits, n_classes, loader, tau, metric=metric, skip=skip
            )
        else:
            res = br_evaluator_similarity_fused(
                model, state, n_exits, n_classes, loader, metric, tau, skip=skip
            )
        counts = [res[f"b{i + 1}_count"] for i in range(n_exits - 1)] + [res["count_out"]]
        total = max(sum(counts), 1)
        # exit i pays cumulative_exits[i]; the final head pays the full path
        mean_flops = (
            sum(c * f for c, f in zip(counts[:-1], per_exit_flops[:-1]))
            + counts[-1] * full_flops
        ) / total
        rows.append(
            {
                "metric": metric,
                "t": tau,
                "mIoU_gl": res["mIoU_gl"],
                "exit_counts": counts,
                "mean_flops_per_image": mean_flops,
                "flops_frac_of_full": mean_flops / full_flops,
            }
        )
    return rows


def main():
    ap = argparse.ArgumentParser(description="Early-exit threshold sweep.")
    ap.add_argument("-M", "--model", required=True)
    ap.add_argument("-c", "--n_classes", type=int, required=True)
    ap.add_argument("-D", "--dimensions", type=int, nargs="+", default=[256, 256])
    ap.add_argument("-d", "--dataset", type=str, required=True)
    ap.add_argument("-m", "--metric", type=str, default="ent")
    ap.add_argument("--taus", type=float, nargs="+", default=[0.2, 0.3, 0.4, 0.5, 0.6])
    ap.add_argument("-S", "--skip", type=int, default=0)
    ap.add_argument("-b", "--batch_size", type=int, default=8)
    ap.add_argument("-s", "--save_at", type=str, default="threshold_sweep")
    args = ap.parse_args()

    from ee_semantic_segmentation_tpu.cli import common
    from ee_semantic_segmentation_tpu.data.loader import DataLoader

    model, state = common.load_model(args.model)
    test_set = common.resolve_test_set(args.dataset, args.dimensions[0])
    loader = DataLoader(test_set, args.batch_size)

    rows = sweep(model, state, loader, args.n_classes, args.metric, args.taus,
                 skip=args.skip)
    for r in rows:
        print(json.dumps(r))

    import pandas as pd

    out = args.save_at if args.save_at.endswith("csv") else f"{args.save_at}.csv"
    pd.DataFrame(rows).to_csv(out, index=False)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
