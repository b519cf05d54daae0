"""Entropy-gated policy evaluation -> appended CSV.

Mirrors /root/reference/eval_br_ent.py:86-163: same flags (-m ent|max|min,
-t threshold, -S skip, -p pool_size) and the same CSV row schema
(b{i}_mIoU, b{i}_count, mIoU_out, count_out, mIoU_gl, out_gl, t, pool,
pool_size).
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate trained models.")
    p.add_argument("-M", "--models", nargs="+", default=[])
    p.add_argument("-c", "--n_classes", type=int, default=None)
    p.add_argument("-D", "--dimensions", type=int, nargs="+", default=[256, 256])
    p.add_argument("-d", "--dataset", type=str, default=None)
    p.add_argument("-v", "--verbose", action="store_true", default=False)
    p.add_argument("-n", "--n_branches", type=int, default=0)
    p.add_argument("-s", "--save_at", type=str, default="sim_results")
    p.add_argument("-m", "--metric", type=str, default="ent")
    p.add_argument("-t", "--threshold", type=float, default=0.5)
    p.add_argument("-S", "--skip", type=int, default=0)
    p.add_argument("-p", "--pool_size", type=int, default=1)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--pallas_head", action="store_true", default=False,
                   help="fused Pallas upsample+softmax+entropy+argmax head "
                        "(metric 'ent', pool_size 1 only): no full-res "
                        "float32 logits/probs in HBM")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    assert args.metric.lower() in ["ent", "max", "min"]
    if not args.n_classes or args.n_classes < 0:
        raise Exception("Number of classes unspecified! Unnable to compute mIoU.")

    from ee_semantic_segmentation_tpu.cli import common
    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.ee.batch_eval import br_evaluator_entropy_fused

    input_dim = common.resolve_dims(args.dimensions)
    test_set = common.resolve_test_set(args.dataset, input_dim)
    loader = DataLoader(test_set, args.batch_size)

    res = defaultdict(list)
    for model_path in args.models:
        net_id = common.net_id_of(model_path)
        model, state = common.load_model(model_path)
        if args.verbose:
            print(f"Evaluating {net_id}...")
        res["net_id"].append(net_id)
        n_exits = (args.n_branches or model.config.n_branches) + 1
        # fused: forward + gating + bucketed confusion in one XLA program
        vals = br_evaluator_entropy_fused(
            model, state, n_exits, args.n_classes, loader,
            args.threshold, metric=args.metric, size=args.pool_size, skip=args.skip,
            pallas_head=args.pallas_head, mesh=common.auto_mesh(),
        )
        for k, v in vals.items():
            res[k].append(v)
        if args.verbose:
            print(f"... finished evaluation of {net_id}")

    save_at = args.save_at if args.save_at.endswith("csv") else f"{args.save_at}.csv"
    common.append_csv(res, os.path.join(os.getcwd(), save_at), fillna=0)


if __name__ == "__main__":
    main()
