#!/usr/bin/env python3
"""Validate / normalize a manually provided Pascal VOC archive into the
layout the readers expect (VERDICT r02 missing #4).

The reference downloads VOC via torchvision
(/root/reference/get_seg_datasets.py:114-125); this image has zero network
egress, so the dataset must arrive by hand.  This tool makes the first day
with real data plumbing-free:

    python tools/prepare_voc.py --tar VOCtrainval_11-May-2012.tar --root datasets/voc
    python tools/prepare_voc.py --root datasets/voc          # validate only

* extracts the official tarball (expected top dir: VOCdevkit/) when --tar
  is given;
* validates the layout data/voc.py reads (JPEGImages, SegmentationClass,
  ImageSets/Segmentation/{train,val}.txt);
* cross-checks a sample of ids: every listed id has both its .jpg and its
  palette .png, label values ⊆ {0..20, 255};
* prints the split sizes and the exact 40/60 val/test carve the reference
  applies (seed-42 torch random_split — data/voc.split_val_test), so run
  counts can be sanity-checked against published VOC numbers (train 1464,
  val 1449 for VOC2012).

Exit 0 = ready for ``main_bradeepv3.py -d voc_seg`` with
``datasets/voc`` as the data root.
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def extract(tar_path: str, root: str) -> None:
    print(f"extracting {tar_path} -> {root}")
    os.makedirs(root, exist_ok=True)
    with tarfile.open(tar_path) as tf:
        names = tf.getnames()
        top = {n.split("/", 1)[0] for n in names}
        if "VOCdevkit" not in top:
            raise SystemExit(
                f"unexpected archive layout (top-level {sorted(top)}); the "
                "official VOCtrainval tarball has VOCdevkit/ at the top")
        tf.extractall(root, filter="data")
    print(f"extracted {len(names)} entries")


def validate(root: str, year: str = "2012", sample: int = 25) -> int:
    base = os.path.join(root, "VOCdevkit", f"VOC{year}")
    problems = []
    for sub in ("JPEGImages", "SegmentationClass",
                os.path.join("ImageSets", "Segmentation")):
        if not os.path.isdir(os.path.join(base, sub)):
            problems.append(f"missing directory: {os.path.join(base, sub)}")
    if problems:
        for p in problems:
            print("ERROR:", p)
        return 1

    splits = {}
    for split in ("train", "val"):
        lst = os.path.join(base, "ImageSets", "Segmentation", f"{split}.txt")
        if not os.path.exists(lst):
            print(f"ERROR: missing split list {lst}")
            return 1
        with open(lst) as fh:
            splits[split] = [l.strip() for l in fh if l.strip()]
        print(f"{split}: {len(splits[split])} ids")

    try:
        from PIL import Image
    except ImportError:
        print("WARNING: PIL unavailable — skipping content checks")
        Image = None

    rng = np.random.RandomState(0)
    for split, ids in splits.items():
        pick = rng.choice(len(ids), size=min(sample, len(ids)), replace=False)
        for i in pick:
            vid = ids[i]
            jpg = os.path.join(base, "JPEGImages", f"{vid}.jpg")
            png = os.path.join(base, "SegmentationClass", f"{vid}.png")
            if not os.path.exists(jpg):
                problems.append(f"{split}/{vid}: missing {jpg}")
                continue
            if not os.path.exists(png):
                problems.append(f"{split}/{vid}: missing {png}")
                continue
            if Image is not None:
                lab = np.asarray(Image.open(png))
                bad = set(np.unique(lab)) - set(range(21)) - {255}
                if bad:
                    problems.append(f"{split}/{vid}: unexpected labels {bad}")
                if Image.open(png).mode != "P":
                    problems.append(f"{split}/{vid}: label not palette-mode")
    if problems:
        for p in problems:
            print("ERROR:", p)
        return 1

    # the reference's seed-42 40/60 val/test carve of the official val list
    # (get_seg_datasets.py:133-136) — reproduced by data/voc.split_val_test
    from ee_semantic_segmentation_tpu.data.voc import split_val_test

    val_idx, test_idx = split_val_test(len(splits["val"]))
    print(f"reference split of official val: {len(val_idx)} val / "
          f"{len(test_idx)} test (seed 42)")
    print(f"OK: VOC{year} at {base} is ready "
          f"(pass the parent of VOCdevkit as the data root)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tar", default=None, help="official VOCtrainval tarball")
    ap.add_argument("--root", required=True, help="destination data root")
    ap.add_argument("--year", default="2012")
    args = ap.parse_args()
    if args.tar:
        extract(args.tar, args.root)
    return validate(args.root, args.year)


if __name__ == "__main__":
    sys.exit(main())
