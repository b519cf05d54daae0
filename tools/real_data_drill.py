#!/usr/bin/env python3
"""Turnkey real-data day: validate -> short train -> every eval CLI ->
parity checklist (VERDICT r03 #5 / r04 #5).

Zero egress means VOC/Cityscapes must arrive by hand; when that day comes
this ONE command proves the whole pipeline on the real data instead of an
improvised afternoon:

    make real-data DATA=/path/containing/VOCdevkit
    # == python tools/real_data_drill.py --data /path/containing/VOCdevkit

Steps (all inside --workdir, default ./real_data_drill):

1. layout validation (tools/prepare_voc.py logic: split files, sample
   id cross-check, label range);
2. the reference's path convention is ``./datasets/<prefix>``
   (get_seg_datasets.py:108-146, eval_mIoU.py:78) — a symlink
   ``datasets/voc -> DATA`` wires the real tree in without copying;
3. short smoke train through the real CLI (main_bradeepv3_ce, CE loss,
   --epochs 1 by default) -> checkpoint + training CSV + message file;
4. every eval CLI against the produced checkpoint: eval_mIoU, eval_br_ent,
   eval_br_sim, eval_br_images, eval_flops, ee_dnn_op_ne, eval_image;
5. prints the 0.2-pt parity checklist: the exact commands (both frameworks)
   for the acceptance comparison, with this run's CSV rows inlined.

The drill is e2e-tested against a generated mini VOCdevkit tree
(tests/test_real_data_drill.py), so step order and flag spellings cannot
rot between now and real-data day.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def banner(msg):
    print(f"\n=== {msg} ===", flush=True)


def run_drill(data_root: str, workdir: str, *, dim=256, epochs=1, batch=8,
              n_branches=2, backbone="resnet50", lr=0.05, dataset="voc_seg",
              threshold=0.5) -> dict:
    from tools.prepare_voc import validate

    banner(f"1/5 validate {data_root}")
    if dataset == "voc_seg":
        rc = validate(data_root)
        if rc:
            raise SystemExit(f"VOC layout validation failed (rc={rc})")
    else:
        print(f"(no layout validator for {dataset}; readers will raise on "
              "a broken tree)")

    banner(f"2/5 wire {data_root} into the reference path convention")
    os.makedirs(os.path.join(workdir, "datasets"), exist_ok=True)
    link = os.path.join(workdir, "datasets", dataset.split("_")[0])
    if not os.path.exists(link):
        os.symlink(os.path.abspath(data_root), link)
    print(f"{link} -> {os.path.abspath(data_root)}")

    cwd = os.getcwd()
    os.chdir(workdir)
    results: dict = {}
    try:
        banner(f"3/5 smoke train ({epochs} epoch(s), {dim}px, b{batch})")
        from ee_semantic_segmentation_tpu.cli.main_bradeepv3_ce import main as train_main

        name = "drill"
        train_main(["-t", backbone, "-d", dataset, "-D", str(dim),
                    "-b", str(batch), "-n", str(n_branches),
                    "-e", str(epochs), "-N", name, "-l", str(lr)])
        ckpt = os.path.join(f"{dataset}_results", name, name)
        assert os.path.exists(ckpt + ".json"), f"no checkpoint at {ckpt}"
        results["checkpoint"] = os.path.abspath(ckpt)

        banner("4/5 every eval CLI against the checkpoint")
        from ee_semantic_segmentation_tpu.cli import (
            ee_dnn_op_ne,
            eval_br_ent,
            eval_br_images,
            eval_br_sim,
            eval_flops,
            eval_image,
            eval_miou,
        )
        from ee_semantic_segmentation_tpu.data.loader import dataset_class_info

        n_classes, _ = dataset_class_info(dataset)
        C, D, N = str(n_classes), str(dim), str(n_branches)
        eval_miou.main(["-M", ckpt, "-c", C, "-D", D, D, "-d", dataset,
                        "-n", N, "-s", "drill_miou", "-b", str(batch)])
        eval_br_ent.main(["-M", ckpt, "-c", C, "-D", D, D, "-d", dataset,
                          "-n", N, "-t", str(threshold), "-s", "drill_ent",
                          "-b", str(batch)])
        eval_br_sim.main(["-M", ckpt, "-c", C, "-D", D, D, "-d", dataset,
                          "-n", N, "-m", "mse", "-t", "1e9",
                          "-s", "drill_sim", "-b", str(batch)])
        eval_br_images.main(["-M", ckpt, "-c", C, "-D", D, D, "-d", dataset,
                             "-n", N, "-m", "mse", "-t", "1e9",
                             "-s", "drill_img", "-b", str(batch)])
        eval_flops.main(["-M", ckpt, "-s", D])
        ee_dnn_op_ne.main(["-M", ckpt, "-m", "ent", "-t", str(threshold),
                           "-s", D, D, "-d", dataset, "-n", C,
                           "--engine", "masked", "-b", str(batch)])
        # eval_image on the first test jpg in the tree (voc only)
        if dataset == "voc_seg":
            jpgs = os.path.join(link, "VOCdevkit", "VOC2012", "JPEGImages")
            first = sorted(os.listdir(jpgs))[0]
            eval_image.main(["-M", ckpt, "-i", os.path.join(jpgs, first)])

        import pandas as pd

        for tag, path in (("mIoU", "drill_miou.csv"), ("br_ent", "drill_ent.csv"),
                          ("br_sim", "drill_sim.csv"), ("br_images", "drill_img.csv"),
                          ("flops", f"{n_branches}_branches_model_flops.csv"),
                          ("ee_op", f"ee_{n_branches}_ent_lw_m2_res.csv")):
            assert os.path.exists(path), f"{tag} CSV missing: {path}"
            results[tag] = pd.read_csv(path).iloc[-1].to_dict()

        banner("5/5 the 0.2-pt parity checklist")
        print(f"""This run (ours, {epochs} epoch smoke):
  b-exit mIoU row: {results['mIoU']}

Acceptance rehearsal (BASELINE.json: per-exit test mIoU within 0.2 pts):
 [ ] full training, ours:   python main_bradeepv3_ce.py -t {backbone} -d {dataset} \\
         -D {dim} -b {batch} -n {n_branches} -e 50 -N full -l {lr}
 [ ] full training, theirs: python /root/reference/main_bradeepv3_ce.py (same flags;
         needs torchvision weights + CUDA or a long CPU run)
 [ ] eval both through their own eval CLIs on the SAME test split (the
         seed-42 40/60 val/test carve is index-parity-tested,
         tests/test_data.py) and diff per-exit columns <= 0.002
 [ ] OR migrate their trained .pth: tools/convergence_parity.py proves the
         migrated-checkpoint eval path agrees to ~1e-10 on synthetic; use
         models/import_reference.convert_reference_state_dict on the real
         checkpoint and re-run eval_mIoU.py here.""")
        return results
    finally:
        os.chdir(cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="directory containing VOCdevkit/ (or a cityscapes "
                         "root with --dataset cityscapes)")
    ap.add_argument("--dataset", default="voc_seg")
    ap.add_argument("--workdir", default="./real_data_drill")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--branches", type=int, default=2)
    ap.add_argument("--backbone", default="resnet50")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    run_drill(args.data, args.workdir, dim=args.dim, epochs=args.epochs,
              batch=args.batch, n_branches=args.branches,
              backbone=args.backbone, dataset=args.dataset)
    print("\nreal_data_drill: OK")


if __name__ == "__main__":
    main()
