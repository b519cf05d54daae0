"""Per-exit cumulative FLOPs -> appended CSV.

Mirrors /root/reference/eval_flops.py:52-88: same flags and the
``{net_id, x, y, b{i}_flops}`` schema, but the numbers come from the
analytic table (model.flops_table) — prefix-summed trunk segments plus the
exit head, exactly the ``count_flops`` recipe (eval_flops.py:28-50) without
any probe forwards.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate trained models.")
    p.add_argument("-M", "--models", nargs="+", default=[])
    p.add_argument("-v", "--verbose", action="store_true", default=False)
    p.add_argument("-s", "--size", type=int, nargs="+", default=[256])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ee_semantic_segmentation_tpu.cli import common
    from ee_semantic_segmentation_tpu.train import checkpoint as ckpt
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyDeepLabV3

    img_size = args.size
    for model_path in args.models:
        res = defaultdict(list)
        if args.verbose:
            print(f"Evaluating {model_path}...")
        net_id = common.net_id_of(model_path)
        cfg = ckpt.load_config(model_path)
        model = BranchyDeepLabV3(config=cfg)
        n = cfg.n_branches
        res["net_id"].append(net_id)
        res["x"].append(img_size[0])
        if len(img_size) == 1:
            res["y"].append(img_size[0])
            table = model.flops_table(img_size[0])
        else:
            res["y"].append(img_size[1])
            table = model.flops_table((img_size[0], img_size[1]))
        for i, f in enumerate(table["cumulative_exits"]):
            res[f"b{i + 1}_flops"].append(f)
        common.append_csv(res, f"./{n}_branches_model_flops.csv")
        if args.verbose:
            print("...done")


if __name__ == "__main__":
    main()
