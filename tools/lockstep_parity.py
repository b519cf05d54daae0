#!/usr/bin/env python3
"""Lockstep torch-vs-JAX training parity runner (VERDICT r02 #1).

Runs the reference's OWN torch train path — ``train_funcs.train_epoch``
(/root/reference/train_funcs.py:12-33) with the reference's losses and the
``deepv3_funcs.py:74-101`` optimizer groups — on a torch reconstruction of
branchyDeepv3 (tests/torch_branchy.py), against our ``make_train_step`` +
``branchy_lr_multipliers`` + ``sgd_momentum``, from IDENTICAL initial
weights on IDENTICAL batches, and reports per-step losses and end-state
parameter agreement as one JSON line.

Runs in FLOAT64 on both sides (``jax_enable_x64``, ``net.double()``) so the
comparison isolates *semantics* from float32 conditioning: measured on this
model, one-step f64 gradients agree to ~1e-11 relative, while f32 gradients
differ up to ~4% purely from BatchNorm cancellation noise (same math, both
frameworks) — which SGD then amplifies ~1.8x per step.  x64 is a global JAX
flag, so this lives in a subprocess-runnable tool instead of the pytest
process (tests/test_train_parity_torch.py invokes it).

Usage: python tools/lockstep_parity.py --loss ce|lovasz [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

LR = 0.02
BASE_LR = 0.01
N_CLASSES = 21
VOID = 21
IMG = 32
BATCH = 2


def import_reference_train_funcs():
    """Import the reference's train_funcs with its missing-snapshot imports
    shimmed (module_variables pulls 6 files absent from the repo snapshot —
    SURVEY.md "incomplete snapshot"; train_epoch itself uses none of them;
    funcs.py:40 needs ``nn`` from module_variables' star-re-exports)."""
    if "module_variables" not in sys.modules:
        shim = types.ModuleType("module_variables")
        shim.nn = torch.nn
        shim.init = torch.nn.init
        shim.tch_round = torch.round
        sys.modules["module_variables"] = shim
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import train_funcs

    return train_funcs


def batches(seed, n):
    rng = np.random.RandomState(seed)
    return [
        (rng.randn(BATCH, 3, IMG, IMG).astype(np.float64),
         rng.randint(0, VOID + 1, (BATCH, IMG, IMG)).astype(np.int64))
        for _ in range(n)
    ]


def build_models():
    import dataclasses

    from torch_branchy import RefBranchyDeepv3

    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyDeepLabV3
    from ee_semantic_segmentation_tpu.models.import_reference import (
        convert_reference_state_dict,
    )
    from ee_semantic_segmentation_tpu.models.import_torch import merge_variables

    torch.manual_seed(11)
    net = RefBranchyDeepv3(depth=50, segment_ends=(3,), num_classes=N_CLASSES,
                           dropout=0.0).double()
    cfg, imported = convert_reference_state_dict(
        net.state_dict(), img_dim=IMG, num_classes=N_CLASSES)
    cfg = dataclasses.replace(cfg, head_dropout=0.0)
    model = BranchyDeepLabV3(config=cfg, dtype=jnp.float64)
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((BATCH, IMG, IMG, 3)), train=False)
    variables = merge_variables(init_vars, imported)
    variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), variables)
    return net, model, variables


def run_torch(net, loss_obj, data):
    """The reference's per-epoch loop + deepv3_funcs.py:82-99 param groups
    (backbone @ base_lr, branches @ lr, classifier @ 1.1*lr, SGD momentum .9
    weight_decay 5e-4)."""
    train_funcs = import_reference_train_funcs()
    from torch import optim

    params = [
        {"params": net.base_model.parameters(), "lr": BASE_LR},
        {"params": net.branches.parameters(), "lr": LR},
        {"params": net.classifier.parameters(), "lr": LR * 1.1},
    ]
    optimizer = optim.SGD(params, lr=LR, momentum=0.9, weight_decay=5e-4)

    losses = []

    def recording_loss(y_hat, y):
        l = loss_obj(y_hat, y)
        losses.append(float(l.detach().mean()))
        return l

    iters = [(torch.from_numpy(x), torch.from_numpy(y)) for x, y in data]
    train_funcs.train_epoch(net, iters, recording_loss, optimizer)
    return losses


def run_flax(model, variables, loss_obj, data):
    from ee_semantic_segmentation_tpu.parallel.train_step import (
        TrainState,
        make_train_step,
    )
    from ee_semantic_segmentation_tpu.train.optim import (
        branchy_lr_multipliers,
        sgd_momentum,
    )

    mult = branchy_lr_multipliers(model.config.n_branches, LR, base_lr=BASE_LR)
    tx = sgd_momentum(multipliers=mult)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
    )
    step = make_train_step(model, loss_obj, tx, donate=False)
    losses = []
    for x, y in data:
        x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        state, m = step(state, x_nhwc, jnp.asarray(y), jnp.float64(LR))
        losses.append(float(m["loss"]))
    return losses, state


def leaf_dict(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(leaf_dict(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def compare_params(net, init_variables, final_state):
    from ee_semantic_segmentation_tpu.models.import_reference import (
        convert_reference_state_dict,
    )

    _, torch_final = convert_reference_state_dict(
        net.state_dict(), img_dim=IMG, num_classes=N_CLASSES)
    init_leaves = leaf_dict(init_variables["params"])
    torch_leaves = leaf_dict(torch_final["params"])
    flax_leaves = leaf_dict(final_state.params)
    assert set(torch_leaves) == set(flax_leaves)

    worst_rel, worst_rel_k = 0.0, None
    worst_cos, worst_cos_k = 1.0, None
    for k, tv in torch_leaves.items():
        fv = flax_leaves[k]
        denom = np.linalg.norm(tv) + 1e-30
        rel = float(np.linalg.norm(fv - tv) / denom)
        if rel > worst_rel:
            worst_rel, worst_rel_k = rel, k
        dt = (tv - init_leaves[k]).ravel()
        df = (fv - init_leaves[k]).ravel()
        nt, nf = np.linalg.norm(dt), np.linalg.norm(df)
        if nt > 1e-12 and nf > 1e-12:
            cos = float(np.dot(dt, df) / (nt * nf))
            if cos < worst_cos:
                worst_cos, worst_cos_k = cos, k
    return dict(worst_param_rel=worst_rel, worst_param_rel_leaf=worst_rel_k,
                worst_delta_cos=worst_cos, worst_delta_cos_leaf=worst_cos_k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loss", choices=["ce", "lovasz"], required=True)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import_reference_train_funcs()
    net, model, variables = build_models()
    data = batches(seed=1 if args.loss == "ce" else 2, n=args.steps)

    if args.loss == "ce":
        import my_pixelwise_xentropy as ref_xent  # reference code

        from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss

        ref_loss = ref_xent.BrXEntropyLoss(
            ignore_index=VOID, b_reduction="sum",
            n_exits=model.config.n_branches + 1)
        our_loss = BrXEntropyLoss(ignore_index=VOID, b_reduction="sum",
                                  n_exits=model.config.n_branches + 1)
    else:
        import branchy_seg_losses as BSL  # reference code

        from ee_semantic_segmentation_tpu.ops.branchy import LovaszSoftmax

        # the main_bradeepv3.py:121 training config (per-batch, 'present').
        # The vendored Berman lovasz_grad hard-casts to Float
        # (lovaszsoftmax.py:25-27), so the reference loss cannot run in
        # f64 — cast logits to f32 at the loss boundary on BOTH sides
        # (model/optimizer stay f64; the shared f32 rounding of near-equal
        # f64 logits keeps the comparison tight).
        _ref = BSL.LovaszSoftmax(classes="present", ignore=VOID,
                                 n_branches=model.config.n_branches)
        ref_loss = lambda y, t: _ref(y.float(), t).double()
        _our = LovaszSoftmax(classes="present", ignore=VOID,
                             n_branches=model.config.n_branches,
                             per_image=False)
        our_loss = lambda y, t: _our(y.astype(jnp.float32), t).astype(jnp.float64)

    torch_losses = run_torch(net, ref_loss, data)
    flax_losses, final_state = run_flax(model, variables, our_loss, data)

    rel = [abs(a - b) / max(abs(b), 1e-30)
           for a, b in zip(flax_losses, torch_losses)]
    out = dict(loss=args.loss, steps=args.steps,
               torch_losses=torch_losses, flax_losses=flax_losses,
               max_loss_rel=max(rel))
    out.update(compare_params(net, variables, final_state))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
