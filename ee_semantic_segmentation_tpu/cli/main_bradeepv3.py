"""Train branchy DeepLabV3 with multi-exit Lovász-softmax.

Mirrors /root/reference/main_bradeepv3.py: same flags (:24-36), same
``dts_info`` experiment dict (:92-134) — loss =
``LovaszSoftmax(classes='present', ignore=21, n_branches)`` (:121), batch 32,
21 classes, VOC — driving the TPU-native orchestration
(train.eval_deepv3).
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate branched deepv3.")
    p.add_argument("-t", "--type", type=str, default="resnet101")
    p.add_argument("-n", "--n_branches", type=int, default=0)
    p.add_argument("-N", "--Name", type=str, default="deep_v3_resnet101")
    p.add_argument("-p", "--print_file", type=str, default=None)
    p.add_argument("-e", "--num_epochs", type=int, default=0)
    p.add_argument("-l", "--lr", type=float, default=0.01)
    p.add_argument("-m", "--min_lr", type=float, default=0.0)
    p.add_argument("-L", "--base_lr", type=float, default=0)
    p.add_argument("-c", "--count_branches", action="store_true", default=False)
    p.add_argument("-s", "--skip", type=int, default=0)
    p.add_argument("-f", "--fine_tune", type=str, default="")
    p.add_argument("-d", "--dataset", type=str, default="voc_seg",
                   help="voc_seg (default), cityscapes, or synthetic")
    p.add_argument("-P", "--per_image_loss", action="store_true", default=False,
                   help="per-image Lovász: 2.7x faster grad on TPU (smaller, "
                        "better-parallelized sorts); default is the "
                        "reference's per-batch semantics "
                        "(branchy_seg_losses.py:134 per_image=False)")
    p.add_argument("-B", "--batch_loss", action="store_true", default=False,
                   help="force per-batch Lovász (the default; kept for "
                        "back-compat, overrides -P)")
    p.add_argument("-K", "--max_present", type=int, default=None,
                   help="Lovász: sort/score only the K most frequent present "
                        "classes per image (the loss is sort-bound; exact "
                        "when images have <= K present classes — typical VOC "
                        "images have 2-5 of 21). Default: all classes "
                        "(exact)")
    p.add_argument("-X", "--exact_compaction", action="store_true", default=False,
                   help="with -K: stay exact ALWAYS — a lax.cond falls back "
                        "to the all-class Lovász whenever a batch exceeds K "
                        "present classes (costs one extra branch compile)")
    p.add_argument("-G", "--hist_bins", type=int, default=None,
                   help="SORT-FREE histogram Lovász with this many error "
                        "buckets (128 * a power of two, e.g. 1024): replaces "
                        "the per-class sort with MXU histogram kernels. "
                        "Approximate — per-class loss error is bounded by "
                        "error_range/bins. Default: exact sorted Lovász")
    p.add_argument("-D", "--input_dim", type=int, nargs="+", default=[256],
                   help="square side, or H W for non-square (e.g. -D 512 1024)")
    p.add_argument("-b", "--batch_size", type=int, default=32)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: split each batch into this "
                        "many micro-batches inside the jitted step (lax.scan "
                        "value+grad per micro-batch, one SGD update with the "
                        "mean gradient). Peak HBM scales with "
                        "batch_size/accum_steps — lets full-res (2048x1024) "
                        "training run effective batches beyond the b2 "
                        "single-chip envelope")
    p.add_argument("--seed", type=int, default=0,
                   help="init RNG seed (params/dropout); lets experiments "
                        "measure run-to-run variance explicitly")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial partitioning: shard image height over an "
                        "sp-way 'space' mesh axis (devices = dp*sp; GSPMD "
                        "inserts conv halo exchanges). Use for full-res "
                        "inputs whose activations exceed one chip's HBM; "
                        "default 1 = pure data parallelism")
    return p


def resolve_input_dim(dims):
    """[d] -> d; [h, w] -> (h, w) (square collapses to int)."""
    if isinstance(dims, int):
        return dims
    dims = [int(d) for d in dims]
    if len(dims) == 1 or dims[0] == dims[1]:
        return dims[0]
    return tuple(dims[:2])


def make_dts_info(args, loss):
    """Assemble the experiment dict (main_bradeepv3.py:92-134 shape)."""
    from ee_semantic_segmentation_tpu.data.loader import LoadDataset, dataset_class_info

    dataset = args.dataset
    og_dir = os.getcwd()
    r_dir = os.path.join(og_dir, f"{dataset}_results")
    os.makedirs(r_dir, exist_ok=True)
    data_path = os.path.join(og_dir, "datasets", dataset.split("_")[0])

    base_lr = args.base_lr
    if args.n_branches and not base_lr:
        base_lr = args.lr

    input_dim = resolve_input_dim(args.input_dim)
    n_classes, _ = dataset_class_info(dataset)
    hand = LoadDataset(input_dim, None, None)
    train_set, val_set, test_set = hand.get_dataset(data_path, dataset)

    use_file = args.print_file or f"{dataset}_deepv3_msgs.txt"
    info = {
        "name": args.Name,
        "main_dir": og_dir,
        "res_dir": r_dir,
        "input_dim": input_dim,
        "train_set": train_set,
        "val_set": val_set,
        "test_set": test_set,
        "use_file": use_file,
        "metrics": ["mIoU"],
        "minimize": False,
        "n_branches": args.n_branches,
        "count_branches": args.count_branches,
        "depth": 50 if "resnet50" in args.type else 101,
        "backbone": "mobilenet_v3_large" if "mobilenet" in args.type else "resnet",
        "lr": args.lr,
        "min_lr": args.min_lr,
        "base_lr": base_lr,
        "num_epochs": args.num_epochs,
        "batch_sizes": args.batch_size,
        "loss": loss,
        "use_scheduler": True,
        "nout_channels": n_classes,
        "skip": args.skip,
        "fine_tune": args.fine_tune or None,
        "freeze_backbone": bool(args.fine_tune),
        "freeze_from": None,
        "weighted_lr": False,
        "branch_params": None,
        "accum_steps": getattr(args, "accum_steps", 1),
        "seed": getattr(args, "seed", 0),
    }
    if getattr(args, "sp", 1) > 1:
        from ee_semantic_segmentation_tpu.parallel import make_mesh_2d

        # ('data', 'space') mesh: trainer + eval steps pick it up via
        # kwargs["mesh"] and shard image height with GSPMD halo exchange
        info["mesh"] = make_mesh_2d(sp=args.sp)
    return info


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ee_semantic_segmentation_tpu.data.loader import dataset_class_info
    from ee_semantic_segmentation_tpu.ops.branchy import LovaszSoftmax
    from ee_semantic_segmentation_tpu.train.trainer import eval_deepv3
    from ee_semantic_segmentation_tpu.utils.logging import log_msg

    _, void = dataset_class_info(args.dataset)
    loss = LovaszSoftmax(
        classes="present", ignore=void, n_branches=args.n_branches,
        per_image=args.per_image_loss and not args.batch_loss,
        max_present=args.max_present,
        exact_fallback=args.exact_compaction,
        hist_bins=args.hist_bins,
    )
    info = make_dts_info(args, loss)
    ret = eval_deepv3(info)
    log_msg(f"Finished training. model is saved @ {ret}", info["use_file"], True)
    log_msg("-" * 20, info["use_file"], True)
    return ret


if __name__ == "__main__":
    main()
