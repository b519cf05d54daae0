"""SGD with torch semantics + per-group learning rates, on optax.

The reference optimizes with ``optim.SGD(params, lr, momentum=.9,
weight_decay=5e-4)`` over param groups — backbone at ``base_lr``, each
branch at ``lr * w_i`` (``weighted_lr`` -> linspace(1, 1.2)), classifier at
``lr * 1.1``, with optional backbone / tail-branch freezing
(/root/reference/deepv3_funcs.py:74-101).

TPU-native shape: one fused transformation for the whole param tree —
``add_decayed_weights -> trace(momentum) -> per-leaf multiplier -> scale(-1)``
— and the *scalar* learning rate applied inside the train step
(``params + lr * updates``) so host-side schedulers (polynomial / plateau)
change the LR every epoch without recompiling.  Per-group LRs are the static
multiplier tree; a multiplier of 0 freezes the leaf (its update is zeroed,
momentum keeps tracing but never lands, mirroring torch where frozen params
simply receive no step).

torch-SGD equivalence (dampening=0, nesterov=False):
  g <- grad + wd * p;  buf <- m * buf + g;  p <- p - lr * buf
optax.trace(decay=m) reproduces exactly this buffer.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
import optax


def label_params(path_tuple) -> str:
    """Map a param path to its group: 'backbone' | 'branch_<k>' | 'classifier'."""
    top = path_tuple[0] if isinstance(path_tuple[0], str) else path_tuple[0].key
    if top.startswith(("stem", "block_")):
        return "backbone"
    if top.startswith("branch_"):
        return top
    return "classifier"


def branchy_lr_multipliers(
    n_branches: int,
    lr: float,
    base_lr: float | None = None,
    weighted_lr: bool = False,
    freeze_backbone: bool = False,
    freeze_from: int | None = None,
) -> dict[str, float]:
    """Group -> lr multiplier (relative to the scheduled scalar ``lr``),
    mirroring deepv3_funcs.py:74-99 exactly:

    * backbone at ``base_lr`` (or frozen),
    * ``weighted_lr``: branches at ``lr * linspace(1, 1.2, n)[:-1]`` and the
      classifier at the last weight,
    * ``freeze_backbone`` + ``freeze_from``: branches >= freeze_from frozen,
    * default: branches at ``lr``, classifier at ``lr * 1.1``.
    """
    base_lr = base_lr if base_lr is not None else lr
    mult = {"backbone": 0.0 if freeze_backbone else base_lr / lr}
    if weighted_lr and n_branches:
        # deepv3_funcs.py:86-89: branches[i] get weights[i] for i < n-1; the
        # classifier gets weights[-1]; the LAST branch is never added to a
        # param group — i.e. it is effectively frozen (reference behavior,
        # preserved and documented).
        weights = np.linspace(1.0, 1.2, num=n_branches)
        for i in range(n_branches - 1):
            mult[f"branch_{i}"] = float(weights[i])
        mult[f"branch_{n_branches - 1}"] = 0.0
        mult["classifier"] = float(weights[-1])
    else:
        for i in range(n_branches):
            frozen = freeze_backbone and freeze_from is not None and i >= freeze_from
            mult[f"branch_{i}"] = 0.0 if frozen else 1.0
        mult["classifier"] = 1.0 if freeze_backbone else 1.1
    return mult


def _scale_by_multipliers(multipliers: dict[str, float] | None) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if multipliers is None:
            return updates, state
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * multipliers.get(label_params(path), 1.0), updates
        )
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def sgd_momentum(
    multipliers: dict[str, float] | None = None,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """Returns a transformation whose output updates must be applied as
    ``params + lr * updates`` (lr supplied at step time).

    The multiplier stage is ALWAYS part of the chain (identity when
    ``multipliers`` is None) so the optimizer-state tree has the same
    structure regardless of param-group config — checkpoints restore across
    differently-configured processes (training saves with group LRs; eval
    CLIs rebuild a plain optimizer)."""
    parts = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(_scale_by_multipliers(multipliers))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)
