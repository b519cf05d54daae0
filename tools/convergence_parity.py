#!/usr/bin/env python3
"""Convergence-level accuracy parity, both directions (VERDICT r03 #1, r04 #2).

Two rehearsals of the driver's acceptance criterion ("final mIoU within
0.2 pts"), no dataset and no TPU required:

* **migrate** — train the reference's OWN torch ``branchyDeepv3`` through its
  real train path (/root/reference/train_funcs.py:60-241: ``train`` with the
  deepv3_funcs.py:74-101 optimizer groups and the reference loss), convert
  the trained checkpoint with ``models/import_reference``, save it as one of
  OUR checkpoints, and compare per-exit dataset mIoU computed by the
  reference's eval path (/root/reference/eval_mIoU.py:15-40
  ``mIoU_evaluator``) against our ``cli/eval_miou.py`` CLI on the identical
  test set.  Agreement here proves a reference user can migrate a trained
  model and trust our eval numbers.
* **equiv** — train the same architecture FROM SCRATCH in our framework
  through its real orchestration path (``train_deepv3``: same optimizer
  groups, same loss, same epochs/LR/batch), evaluate through the same CLI,
  and compare final per-exit test mIoU against the reference-trained model's.
  Inits and batch orders are framework-specific (documented), so this is a
  convergence-level comparison, not lockstep (tools/lockstep_parity.py does
  lockstep).

Data: the package's deterministic synthetic voronoi dataset
(data/synthetic.py) — items depend only on (seed, index), so both frameworks
read bit-identical images/labels.  The test set is EXACTLY what our
``-d synthetic`` CLI resolves (SyntheticSegDataset(size=D, n=16, seed=2)).

Both sides run head-dropout 0 (framework RNG streams cannot be aligned;
the reference also validates in train() without net.eval(), so dropout off
removes a pure-noise term from its best-epoch selection).

Runs in a subprocess (the pytest wrapper is tests/test_convergence_parity.py)
on the 8-virtual-device CPU mesh, so the migrated-eval CLI also rehearses the
multi-device checkpoint-restore path.  Prints ONE JSON line.

Usage: python tools/convergence_parity.py --loss ce [--epochs 12] [--dim 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import torch as tch

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

N_CLASSES = 21
VOID = 21


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def import_reference_modules():
    """Import the reference's train_funcs AND eval_mIoU with the snapshot's
    missing modules shimmed (SURVEY.md "incomplete snapshot"):

    * ``module_variables`` star-pulls 6 absent files; the functions we drive
      (train_funcs.train, eval_mIoU.mIoU_evaluator) use none of them beyond
      ``nn``/``init``;
    * ``common_header`` is absent entirely — eval_mIoU needs its ``tch``;
    * ``common_torch``/``get_seg_datasets``/``allocate_cuda_device`` need
      torchvision / my_datahanddlers / pynvml (not installed); eval_mIoU only
      imports names from them that mIoU_evaluator never touches, so attribute
      stubs keep the REAL code paths we measure untouched.
    """
    _stub("module_variables", nn=tch.nn, init=tch.nn.init, tch_round=tch.round)
    _stub("common_header", tch=tch, np=np, os=os, re=__import__("re"))
    _stub("common_torch", nn=tch.nn, tensor=tch.tensor, stack=tch.stack,
          Tensor=tch.Tensor, cat=tch.cat, transpose=tch.transpose,
          F=tch.nn.functional)
    _stub("torchvision")
    _stub("get_seg_datasets", LoadDataset=None)
    _stub("allocate_cuda_device", allocate_cuda=lambda: tch.device("cpu"))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import train_funcs  # noqa: F401  (reference code)
    import eval_mIoU as ref_eval  # noqa: F401  (reference code)

    return train_funcs, ref_eval


# ---------------------------------------------------------------- data


def make_datasets(dim):
    """The exact trio our ``-d synthetic`` CLI resolves
    (data/loader.LoadDataset.synthetic): seeds 0/1/2, sizes 64/16/16."""
    from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset

    mk = lambda seed, n: SyntheticSegDataset(size=dim, n=n, seed=seed)
    return mk(0, 64), mk(1, 16), mk(2, 16)


class TorchLoader:
    """Re-iterable epoch loader for the reference train/eval loops:
    yields (X (B,3,H,W) f32, y (B,H,W) i64); reshuffles per epoch like our
    DataLoader (different permutation stream — documented divergence)."""

    def __init__(self, ds, bs, shuffle=False, seed=0):
        self.ds, self.bs, self.shuffle, self.seed = ds, bs, shuffle, seed
        self.epoch = 0

    def __iter__(self):
        n = len(self.ds)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
            self.epoch += 1
        else:
            order = np.arange(n)
        for i in range(0, n, self.bs):
            items = [self.ds.get(int(j)) for j in order[i : i + self.bs]]
            x = np.stack([im.transpose(2, 0, 1) for im, _ in items])
            y = np.stack([lb for _, lb in items])
            yield tch.from_numpy(x).float(), tch.from_numpy(y).long()


# ---------------------------------------------------------------- torch side


def build_ref_loss(loss_name: str):
    if loss_name == "ce":
        import my_pixelwise_xentropy as ref_xent  # reference code

        # the main_bradeepv3_ce.py:121 config
        return ref_xent.BrXEntropyLoss(ignore_index=VOID, b_reduction="sum",
                                       n_exits=2)
    import branchy_seg_losses as BSL  # reference code

    # the main_bradeepv3.py:121 config (per-batch, classes='present')
    return BSL.LovaszSoftmax(classes="present", ignore=VOID, n_branches=1)


def run_torch(train_funcs, ref_eval, datasets, epochs, lr, base_lr, bs, dim,
              loss_name, workdir, torch_seed=11):
    from torch import optim

    from torch_branchy import RefBranchyDeepv3

    train_ds, val_ds, test_ds = datasets
    tch.manual_seed(torch_seed)
    net = RefBranchyDeepv3(depth=50, segment_ends=(3,), num_classes=N_CLASSES,
                           dropout=0.0)
    # deepv3_funcs.py:82-99 param groups
    params = [
        {"params": net.base_model.parameters(), "lr": base_lr},
        {"params": net.branches.parameters(), "lr": lr},
        {"params": net.classifier.parameters(), "lr": lr * 1.1},
    ]
    optimizer = optim.SGD(params, lr=lr, momentum=0.9, weight_decay=5e-4)
    loss = build_ref_loss(loss_name)

    saveat = os.path.join(workdir, "ref_best.pth")
    # num_epochs+1: the reference's loop arithmetic trains num_epochs-1
    # (SURVEY bug #7); minimize=False so val mIoU improvement saves
    # val batch 4: the reference validates WITHOUT net.eval()
    # (train_funcs.py:167-181), and a trailing singleton batch kills
    # BatchNorm in train mode — 16 % 4 == 0 avoids it
    train_funcs.train(
        net, TorchLoader(train_ds, bs, shuffle=True, seed=5), loss,
        epochs + 1, optimizer, val_iter=TorchLoader(val_ds, 4),
        metrics=[("mIoU", ref_eval.mIoU_evaluator)], patience=None,
        saveat=saveat, verbose=False, device=tch.device("cpu"),
        minimize=False, n_branches=1, nout_channels=N_CLASSES,
    )
    if os.path.exists(saveat):
        net.load_state_dict(tch.load(saveat)["model_state_dict"])
    # the reference's final-test eval (deepv3_funcs.py:262-269): net.eval()
    net.eval()
    ref_res = ref_eval.mIoU_evaluator(
        net, 2, N_CLASSES, TorchLoader(test_ds, 5), tch.device("cpu")
    )
    return net, {k: float(v) for k, v in ref_res.items()}


# ---------------------------------------------------------------- jax side


def save_migrated(net, dim, workdir):
    """Trained reference state dict -> one of OUR checkpoints on disk."""
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyDeepLabV3
    from ee_semantic_segmentation_tpu.models.import_reference import (
        convert_reference_state_dict,
    )
    from ee_semantic_segmentation_tpu.models.import_torch import merge_variables
    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train import checkpoint as ckpt
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    cfg, imported = convert_reference_state_dict(
        net.state_dict(), img_dim=dim, num_classes=N_CLASSES)
    model = BranchyDeepLabV3(config=cfg)
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(0),
        jnp.zeros((1, dim, dim, 3)))
    init_vars = {"params": state.params, "batch_stats": state.batch_stats}
    variables = merge_variables(init_vars, imported)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    return ckpt.save_checkpoint(workdir, "migrated", state, cfg), cfg


def eval_ours_cli(ckpt_path, dim, tag, workdir):
    """Per-exit test mIoU through OUR real CLI (cli/eval_miou.py) — the
    same entry a reference user would run; on a multi-device host this also
    exercises the mesh-sharded restore path."""
    from ee_semantic_segmentation_tpu.cli.eval_miou import main

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        out = f"{tag}_miou"
        main(["-M", ckpt_path, "-c", str(N_CLASSES), "-D", str(dim), str(dim),
              "-d", "synthetic", "-n", "1", "-s", out, "-b", "8"])
        import pandas as pd

        row = pd.read_csv(out + ".csv").iloc[-1]
        return {"b1_mIoU": float(row["b1_mIoU"]), "mIoU": float(row["mIoU"])}
    finally:
        os.chdir(cwd)


def run_ours_scratch(cfg, datasets, epochs, lr, base_lr, bs, loss_name,
                     workdir):
    """Scratch training through OUR real orchestration (train_deepv3)."""
    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyDeepLabV3
    from ee_semantic_segmentation_tpu.train.trainer import train_deepv3

    if loss_name == "ce":
        from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss

        loss = BrXEntropyLoss(ignore_index=VOID, b_reduction="sum", n_exits=2)
    else:
        from ee_semantic_segmentation_tpu.ops.branchy import LovaszSoftmax

        loss = LovaszSoftmax(classes="present", ignore=VOID, n_branches=1,
                             per_image=False)

    train_ds, val_ds, test_ds = datasets
    model = BranchyDeepLabV3(config=cfg)
    kwargs = dict(
        name="scratch", mod_dir=workdir, lr=lr, base_lr=base_lr,
        loss=loss, train_set=train_ds, val_loader=DataLoader(val_ds, 4),
        batch_sizes=bs, nout_channels=N_CLASSES, metrics=("mIoU",),
        minimize=False, seed=1,
    )
    _, saved = train_deepv3(model, epochs, kwargs)
    return saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loss", choices=["ce", "lovasz"], default="ce")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--base_lr", type=float, default=0.025)
    ap.add_argument("--skip_equiv", action="store_true",
                    help="migration parity only (faster)")
    ap.add_argument("--workdir", default=None,
                    help="fixed work dir (default: fresh temp dir)")
    ap.add_argument("--torch_seed", type=int, default=11,
                    help="torch init seed — run twice with different seeds "
                         "to measure the reference's own from-scratch "
                         "variance (the yardstick for equiv_max_abs_diff)")
    args = ap.parse_args()

    train_funcs, ref_eval = import_reference_modules()
    datasets = make_datasets(args.dim)
    workdir = args.workdir or tempfile.mkdtemp(prefix="convergence_parity_")
    os.makedirs(workdir, exist_ok=True)

    net, ref_res = run_torch(
        train_funcs, ref_eval, datasets, args.epochs, args.lr, args.base_lr,
        args.batch, args.dim, args.loss, workdir, torch_seed=args.torch_seed)

    ckpt_path, cfg = save_migrated(net, args.dim, workdir)
    ours_migrated = eval_ours_cli(ckpt_path, args.dim, "migrated", workdir)
    migrate_diff = max(
        abs(ours_migrated[k] - ref_res[k]) for k in ("b1_mIoU", "mIoU"))

    out = dict(
        loss=args.loss, epochs=args.epochs, dim=args.dim,
        ref=ref_res, ours_migrated=ours_migrated,
        migrate_max_abs_diff=migrate_diff,
    )

    if not args.skip_equiv:
        saved = run_ours_scratch(cfg, datasets, args.epochs, args.lr,
                                 args.base_lr, args.batch, args.loss, workdir)
        ours_scratch = eval_ours_cli(saved, args.dim, "scratch", workdir)
        out["ours_scratch"] = ours_scratch
        out["equiv_max_abs_diff"] = max(
            abs(ours_scratch[k] - ref_res[k]) for k in ("b1_mIoU", "mIoU"))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
