#!/usr/bin/env python3
"""Generate golden expected values by running the reference implementation.

Runs the torch code at /root/reference (read-only) on the shared fixtures in
tests/fixtures.py and dumps scalars to tests/golden/reference_values.json.
The pytest suite never imports the reference — only this one-shot tool does.

Usage: python tools/gen_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../tests"))
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

import fixtures as FX

import new_seg_losses as ref_single
import branchy_seg_losses as ref_branchy
import my_pixelwise_xentropy as ref_xent
import seg_metrics as ref_sm
import compute_mIoU as ref_miou
from lovaszsoftmax import (
    binary_xloss as ref_binary_xloss,
    iou as ref_iou,
    iou_binary as ref_iou_binary,
    lovasz_hinge as ref_lovasz_hinge,
    lovasz_softmax as ref_lovasz,
)

OUT = os.path.join(os.path.dirname(__file__), "../tests/golden/reference_values.json")


def t(x):
    return torch.from_numpy(np.asarray(x))


def f(x):
    v = x.item() if hasattr(x, "item") else x
    return float(v)


def main():
    g = {}

    # ---- hand fixture (4 classes, no void) --------------------------------
    y_true = t(FX.HAND_TRUE).float()
    y_pred = t(FX.HAND_PRED).float()

    g["hand/jaccard_mean"] = f(ref_single.JaccardLoss()(y_pred, y_true))
    g["hand/jaccard_sum"] = f(ref_single.JaccardLoss(reduction="sum")(y_pred, y_true))
    g["hand/jaccard_index_mean"] = f(ref_single.JaccardLoss(index=True)(y_pred, y_true))
    g["hand/dice_mean"] = f(ref_single.DiceLoss()(y_pred, y_true))
    g["hand/dice_index_mean"] = f(ref_single.DiceLoss(index=True)(y_pred, y_true))
    g["hand/tversky_mean"] = f(ref_single.TverskyLoss()(y_pred, y_true))
    g["hand/ftversky_mean"] = f(ref_single.FocalTverskyLoss(gamma=4 / 3)(y_pred, y_true))
    g["hand/focal_mean"] = f(ref_single.FocalLoss()(y_pred, y_true.long()))
    g["hand/lovasz_present"] = f(ref_lovasz(y_pred, y_true.squeeze(1).long(), classes="present"))
    g["hand/lovasz_all"] = f(ref_lovasz(y_pred, y_true.squeeze(1).long(), classes="all"))
    g["hand/lovasz_per_image"] = f(
        ref_lovasz(y_pred, y_true.squeeze(1).long(), classes="present", per_image=True)
    )

    # mIoU / img_mIoU on the hand fixture (compute_mIoU.py:140-149)
    ev = ref_miou.mIoU(n_classes=4)
    ev(y_pred, y_true)
    g["hand/mIoU"] = f(ev.compute())
    ev2 = ref_miou.img_mIoU()
    for i in range(y_pred.shape[0]):
        ev2(y_pred[i : i + 1], y_true[i : i + 1])
    g["hand/img_mIoU"] = f(ev2.compute())

    # PRF metrics (hand fixture with an out-of-range label, seg_metrics.py:78-166)
    y_true_sm = y_true.clone()
    y_true_sm[1, 0, 3, 5] = 10  # reference fixture plants a void-ish label
    g["hand/recall_macro"] = f(ref_sm.Recall()(y_pred, y_true_sm))
    g["hand/precision_macro"] = f(ref_sm.Precision()(y_pred, y_true_sm))
    g["hand/f1_macro"] = f(ref_sm.F_beta()(y_pred, y_true_sm))
    g["hand/recall_micro"] = f(ref_sm.Recall(avg="micro")(y_pred, y_true_sm))
    g["hand/precision_micro"] = f(ref_sm.Precision(avg="micro")(y_pred, y_true_sm))
    g["hand/f1_micro"] = f(ref_sm.F_beta(avg="micro")(y_pred, y_true_sm))
    g["hand/accuracy"] = f(ref_sm.Accuracy()(y_pred, y_true_sm))

    # ---- random logits with void labels (VOC-like, C=21, void=21) ----------
    logits, labels = FX.random_logits(seed=0)
    lp, lt = t(logits), t(labels)
    g["rand/lovasz_present_ignore"] = f(
        ref_lovasz(lp, lt, classes="present", ignore=21)
    )
    g["rand/lovasz_all_ignore"] = f(ref_lovasz(lp, lt, classes="all", ignore=21))
    g["rand/lovasz_present_per_image_ignore"] = f(
        ref_lovasz(lp, lt, classes="present", per_image=True, ignore=21)
    )
    g["rand/ce_ignore_mean"] = f(
        torch.nn.CrossEntropyLoss(ignore_index=21)(lp, lt)
    )
    g["rand/ce_ignore_sum"] = f(
        torch.nn.CrossEntropyLoss(ignore_index=21, reduction="sum")(lp, lt)
    )
    g["rand/jaccard_mean"] = f(ref_single.JaccardLoss()(lp, lt[:, None].float()))
    g["rand/dice_mean"] = f(ref_single.DiceLoss()(lp, lt[:, None].float()))

    ev = ref_miou.mIoU(n_classes=21)
    ev(lp, lt[:, None].float())
    g["rand/mIoU"] = f(ev.compute())

    # absent classes: 'present' must differ from 'all'
    la, ll = FX.random_logits_absent()
    ap, at = t(la), t(ll)
    g["absent/lovasz_present_ignore"] = f(ref_lovasz(ap, at, classes="present", ignore=6))
    g["absent/lovasz_all_ignore"] = f(ref_lovasz(ap, at, classes="all", ignore=6))
    g["absent/lovasz_list"] = f(ref_lovasz(ap, at, classes=[0, 1, 2], ignore=6))

    # ---- binary hinge / BCE / IoU helpers (lovaszsoftmax.py:34-148) --------
    blogits, blabels = FX.binary_logits()
    bp, bt = t(blogits), t(blabels)
    g["bin/lovasz_hinge_per_image"] = f(ref_lovasz_hinge(bp, bt, per_image=True, ignore=2))
    g["bin/lovasz_hinge_flat"] = f(ref_lovasz_hinge(bp, bt, per_image=False, ignore=2))
    g["bin/lovasz_hinge_no_ignore"] = f(
        ref_lovasz_hinge(bp, bt.clamp(max=1), per_image=False)
    )
    g["bin/binary_xloss"] = f(ref_binary_xloss(bp, bt, ignore=2))
    mp, mt = FX.label_maps()
    g["bin/iou_binary_per_image"] = f(
        ref_iou_binary((mp == 1).astype("int64"), (mt == 1).astype("int64") * (mt != 5) + 5 * (mt == 5), ignore=5, per_image=True)
    )
    g["bin/iou_per_class"] = [
        float(v) for v in ref_iou(t(mp), t(mt), C=5, ignore=5, per_image=False)
    ]
    g["bin/iou_per_class_per_image"] = [
        float(v) for v in ref_iou(t(mp), t(mt), C=5, ignore=5, per_image=True)
    ]

    # ---- multi-exit stacks -------------------------------------------------
    logits_e, labels_e = FX.random_logits(seed=3, exits=4, n=2, c=21, h=8, w=9)
    ep, et = t(logits_e), t(labels_e)
    bl = ref_branchy.LovaszSoftmax(classes="present", ignore=21, n_branches=3)
    g["exit/br_lovasz_sum"] = f(bl(ep, et))
    bl2 = ref_branchy.LovaszSoftmax(classes="present", ignore=21, n_branches=3, prev_out=True)
    g["exit/br_lovasz_prev_out"] = f(bl2(ep, et))
    bx = ref_xent.BrXEntropyLoss(ignore_index=21, b_reduction="sum", n_exits=4)
    g["exit/br_xent_sum"] = f(bx(ep, et))
    bx2 = ref_xent.BrXEntropyLoss(
        ignore_index=21, b_reduction="mean", n_exits=4, weights=[0.25, 0.5, 0.75, 1.0]
    )
    g["exit/br_xent_weighted_mean"] = f(bx2(ep, et))

    # no-void multi-exit losses (one-hot with exactly C classes)
    logits_nv, labels_nv = FX.random_logits_novoid(seed=4, exits=3, n=2, c=5, h=6, w=7)
    np_, nt_ = t(logits_nv), t(labels_nv)
    g["exit/br_dice"] = f(ref_branchy.DiceLoss(n_branches=2)(np_, nt_[:, None].float()))
    g["exit/br_jaccard"] = f(ref_branchy.JaccardLoss(n_branches=2)(np_, nt_[:, None].float()))
    g["exit/br_tversky"] = f(
        ref_branchy.TverskyLoss(alpha=0.7, beta=0.3, n_branches=2)(np_, nt_[:, None].float())
    )
    g["exit/br_ftversky"] = f(
        ref_branchy.FocalTverskyLoss(alpha=0.7, beta=0.3, gamma=4 / 3, n_branches=2)(
            np_, nt_[:, None].float()
        )
    )
    g["exit/br_focal"] = f(ref_branchy.FocalLoss(n_branches=2)(np_, nt_[:, None].long()))

    # Branchy_loss wrapper (funcs.py:40-68).  funcs.py itself cannot be
    # imported (its module_variables import chain hits the snapshot's missing
    # files), so the wrapper's arithmetic is reproduced verbatim in torch:
    # per-exit losses then the equal / min_first / max_first weight mask.
    logits_bf, labels_bf = FX.random_logits_novoid(seed=9, n=2, c=4, h=5, w=6)
    stack_bf = np.stack([logits_bf + 0.1 * k for k in range(3)], axis=1)  # (N, E, C, H, W)
    fl = ref_single.FocalLoss(reduction="mean")
    out_t = t(stack_bf)
    tgt_t = t(labels_bf[:, None]).long()
    n_exits_bf = out_t.shape[1]
    per_exit = torch.stack([fl(out_t[:, i], tgt_t) for i in range(n_exits_bf)])
    g["wrap/branchy_loss_equal"] = [float(v) for v in per_exit]
    mask_min = torch.arange(1, n_exits_bf + 1) / n_exits_bf
    mask_max = torch.arange(n_exits_bf, 0, -1) / n_exits_bf
    g["wrap/branchy_loss_min_first"] = [float(v) for v in mask_min * per_exit]
    g["wrap/branchy_loss_max_first"] = [float(v) for v in mask_max * per_exit]

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(g, fh, indent=2, sort_keys=True)
    print(f"wrote {len(g)} golden values to {OUT}")
    for k in sorted(g):
        v = g[k]
        print(f"  {k:40s} {v if isinstance(v, list) else format(v, '.8g')}")


if __name__ == "__main__":
    main()
