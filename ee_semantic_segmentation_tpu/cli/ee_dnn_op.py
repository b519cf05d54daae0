"""Sequential early-exit engine CLI, similarity gate -> appended CSV.

Mirrors /root/reference/ee_dnn_op.py:120-246: per-image segment-by-segment
inference gated on exit-vs-previous-exit similarity, FLOPs accounting per
exit (avg_flops / edge_flops plus the ``_2`` variants that exclude the first
branch head), exit histogram (e_{i} / out columns), and mIoU of the chosen
exit maps, appended to ``./ee_{n}_{metric}_lw_m2_res.csv``.

The reference's local union-based mIoU (ee_dnn_op.py:20-38 — TP / union
accumulated per class) is preserved for schema parity via
``union_mIoU``.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np


class union_mIoU:
    """The ee_dnn_op.py:20-38 accumulator: per class, sum of intersections /
    sum of unions over all images (union = pixels where either fires)."""

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.acc = np.zeros((2, n_classes), np.float64)

    def __call__(self, pred_map, gt):
        pred_map = np.asarray(pred_map)
        gt = np.asarray(gt).squeeze()
        for c in range(self.n_classes):
            p = pred_map == c
            g = gt == c
            self.acc[0, c] += np.sum(p & g)
            self.acc[1, c] += np.sum(p | g)

    def compute(self):
        with np.errstate(invalid="ignore", divide="ignore"):
            ciou = self.acc[0] / self.acc[1]
        return float(np.nansum(ciou) / self.n_classes)


def build_parser(entropy: bool = False):
    p = argparse.ArgumentParser(description="Evaluate EE-DNN.")
    p.add_argument("-M", "--model")
    p.add_argument("-m", "--metric")
    p.add_argument("-t", "--threshold", type=float)
    if not entropy:
        p.add_argument("-i", "--ignore_background", action="store_true", default=False)
    p.add_argument("-I", "--ignore_branch", nargs="+", type=int, default=[])
    p.add_argument("-v", "--verbose", action="store_true", default=False)
    p.add_argument("-s", "--size", type=int, nargs="+", default=[256, 256])
    p.add_argument("-d", "--dataset", type=str, default=None)
    p.add_argument("-n", "--n_classes", type=int)
    p.add_argument("-p", "--pool_size", type=int, default=1)
    p.add_argument("--engine", choices=["seq", "masked"], default="seq",
                   help="seq = per-image segment-at-a-time (reference "
                        "semantics); masked = batched one-program engine "
                        "(ee/masked.py): lax.cond segment skipping, one "
                        "device dispatch per micro-batch")
    p.add_argument("-b", "--batch_size", type=int, default=8,
                   help="micro-batch size for --engine masked")
    p.add_argument("-S", "--skip", type=int, default=0,
                   help="--engine masked: leave the first S branches "
                        "ungated (equivalent to a leading -I 1..S)")
    if entropy:
        p.add_argument("--pallas_head", action="store_true", default=False,
                       help="masked engine: fused Pallas upsample+entropy+"
                            "argmax gate head")
    return p


def run_masked(args, entropy: bool):
    """Batched masked-engine path (entropy OR similarity gate): whole dataset
    as one lax.scan dispatch per compile; same CSV schema as the sequential
    path.  Compute prices come from the analytic table over the realized exit
    histogram (the masked engine genuinely skips segments at run time)."""
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.cli import common
    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.ee.masked import (
        gated_flops_per_image,
        make_masked_gated_apply,
    )

    metric = args.metric.lower()
    skip = args.skip
    ig = sorted(args.ignore_branch)
    if ig:
        # a leading -I prefix IS a skip; anything non-contiguous can't be
        # expressed at fixed shape (every gated branch head runs)
        if ig != list(range(1, len(ig) + 1)):
            raise SystemExit(
                "--engine masked supports only a leading -I prefix "
                "(e.g. -I 1 2), which is equivalent to -S")
        skip = max(skip, len(ig))

    n_classes = args.n_classes
    ignore_bk = getattr(args, "ignore_background", False)
    sim_ignore = () if entropy else (
        (0, n_classes - 1) if ignore_bk else (n_classes - 1,))
    pool = {"max": "max", "min": "min"}.get(metric, "none") if entropy else "none"

    model, state = common.load_model(args.model)
    n_eexits = model.config.n_branches
    img_size = args.size
    input_dim = img_size[0]

    mesh = common.auto_mesh()
    n_dev = 1 if mesh is None else int(mesh.shape["data"])
    fn = make_masked_gated_apply(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        tau=args.threshold, n_classes=n_classes, skip=skip,
        pool=pool, pool_size=args.pool_size,
        pallas_head=getattr(args, "pallas_head", False),
        metric="ent" if entropy else metric, sim_ignore=sim_ignore,
        mesh=mesh,
    )
    test_set = common.resolve_test_set(args.dataset, input_dim)
    loader = DataLoader(test_set, args.batch_size)

    prog = union_mIoU(n_classes)
    exit_counts: dict = {}
    n_imgs = 0
    for batch in loader:
        count = int(batch.get("count", len(batch["image"])))
        images = np.asarray(batch["image"])
        pad = (-images.shape[0]) % n_dev
        if pad:
            # pad to a device multiple so the gated program stays sharded
            # (padded rows sliced off below via count; VERDICT r04 #3)
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
        labels, exits = fn(jnp.asarray(images))
        labels = np.asarray(labels)[:count]
        exits = np.asarray(exits)[:count]
        for j in range(count):
            prog(labels[j], batch["label"][j])
            e = int(exits[j])
            exit_counts[e] = exit_counts.get(e, 0) + 1
        n_imgs += count

    table = model.flops_table(input_dim)

    def edge_avg(exclude_first):
        # edge = compute spent on-device before offloading: the gated cost
        # for images that exited, everything up to the last branch otherwise
        first = skip + 1 if exclude_first else skip
        edge_cost = (sum(table["segments"][:-1])
                     + sum(table["branches"][first:-1]))
        tot = sum(
            (gated_flops_per_image(model, {e: 1}, skip=skip, img_dim=input_dim,
                                   exclude_first_branch=exclude_first)
             if e <= n_eexits else edge_cost) * c
            for e, c in exit_counts.items()
        )
        return tot / max(n_imgs, 1)

    res = defaultdict(list)
    res["net_id"].append(args.model)
    res["x"].append(img_size[0])
    res["y"].append(img_size[1] if len(img_size) > 1 else img_size[0])
    res["metric"].append(metric)
    res["t"].append(args.threshold)
    for i in range(n_eexits):
        res[f"e_{i + 1}"].append(exit_counts.get(i + 1, 0))
    res["out"].append(exit_counts.get(n_eexits + 1, 0))
    res["n_imgs"].append(n_imgs)
    res["avg_flops"].append(
        gated_flops_per_image(model, exit_counts, skip=skip, img_dim=input_dim)
    )
    res["edge_flops"].append(edge_avg(False))
    if not entropy:
        res["avg_flops_2"].append(gated_flops_per_image(
            model, exit_counts, skip=skip, img_dim=input_dim,
            exclude_first_branch=True))
        res["edge_flops_2"].append(edge_avg(True))
        res["ig_bk"].append(ignore_bk)
    res["mIoU"].append(prog.compute())

    saveat = f"./ee_{n_eexits}_{metric}_lw_m2_res.csv"
    common.append_csv(dict(sorted(res.items())), saveat)


def run(args, entropy: bool):
    from ee_semantic_segmentation_tpu.cli import common
    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.ee.sequential import EarlyExitRunner

    if getattr(args, "engine", "seq") == "masked":
        return run_masked(args, entropy)

    n_classes = args.n_classes
    metric = args.metric
    ignore_bk = getattr(args, "ignore_background", False)
    sim_ignore = (0, n_classes - 1) if ignore_bk else (n_classes - 1,)

    ig_br = sorted(i - 1 for i in args.ignore_branch)

    model, state = common.load_model(args.model)
    n_eexits = model.config.n_branches

    img_size = args.size
    input_dim = img_size[0]
    runner = EarlyExitRunner(
        model, state.params, state.batch_stats,
        metric=metric, threshold=args.threshold,
        less_than=metric.lower() not in ("ssim", "nmi") if not entropy else True,
        ignore=ig_br, n_classes=n_classes, pool_size=args.pool_size,
        sim_ignore=sim_ignore, img_dim=input_dim,
    )

    test_set = common.resolve_test_set(args.dataset, input_dim)
    loader = DataLoader(test_set, 1, pad_final=False)

    res = defaultdict(list)
    res["net_id"].append(args.model)
    res["x"].append(img_size[0])
    res["y"].append(img_size[1] if len(img_size) > 1 else img_size[0])
    res["metric"].append(metric.lower())
    res["t"].append(args.threshold)

    tot = tot2 = edge = edge2 = 0.0
    n_imgs = 0
    prog = union_mIoU(n_classes)
    if args.verbose:
        print(f"Started EE-DNN evaluation.\n\tmodel: {args.model}")
    for batch in loader:
        if n_imgs % 50 == 0 and args.verbose:
            print(f"\tprocessed {n_imgs} images")
        out = runner(batch["image"][0])
        tot += out["exit_flops"]
        edge += out["edge_flops"]
        tot2 += out.get("exit_flops_2", 0.0)
        edge2 += out.get("edge_flops_2", 0.0)
        n_imgs += 1
        prog(out["exit"], batch["label"][0])
        n_exit = out["n"]
        label = "out" if n_exit == n_eexits + 1 else f"e_{n_exit}"
        if label in res:
            res[label][0] += 1
        else:
            res[label].append(1)

    for i in range(n_eexits):
        res.setdefault(f"e_{i + 1}", [0])
    res.setdefault("out", [0])
    res["n_imgs"].append(n_imgs)
    res["avg_flops"].append(tot / max(n_imgs, 1))
    res["edge_flops"].append(edge / max(n_imgs, 1))
    if not entropy:
        res["avg_flops_2"].append(tot2 / max(n_imgs, 1))
        res["edge_flops_2"].append(edge2 / max(n_imgs, 1))
        res["ig_bk"].append(ignore_bk)
    res["mIoU"].append(prog.compute())

    from ee_semantic_segmentation_tpu.cli.common import append_csv

    saveat = f"./ee_{n_eexits}_{metric}_lw_m2_res.csv"
    append_csv(dict(sorted(res.items())), saveat)
    if args.verbose:
        print("...done")


def main(argv=None):
    args = build_parser(entropy=False).parse_args(argv)
    run(args, entropy=False)


if __name__ == "__main__":
    main()
