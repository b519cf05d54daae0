"""Checkpointing: Orbax trees + JSON model spec (no code pickles).

The reference checkpoints ``{model_state_dict, opt_state_dict, epoch,
val_<metric>...}`` on improvement (/root/reference/train_funcs.py:208-216)
and finally pickles the *entire module* (deepv3_funcs.py:186-188) — which
couples checkpoints to code.  Here a checkpoint is:

    <dir>/<name>/          Orbax pytree {params, batch_stats, opt_state, ...}
    <dir>/<name>.json      model spec (BranchyConfig) + scalar metadata

so any process can rebuild the model from the JSON and restore the tree.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np

from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyConfig


def _tree_save(path: str, tree: Any) -> None:
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
    except Exception:
        # msgpack fallback (single-host): robust to orbax API drift
        from flax import serialization

        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        with open(path + ".msgpack", "wb") as fh:
            fh.write(serialization.to_bytes(tree))


def _tree_restore(path: str, template: Any) -> Any:
    if os.path.exists(path + ".msgpack"):
        from flax import serialization

        with open(path + ".msgpack", "rb") as fh:
            return serialization.from_bytes(template, fh.read())
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        if hasattr(x, "dtype")
        else x,
        template,
    )
    return ckptr.restore(os.path.abspath(path), abstract)


def save_checkpoint(directory: str, name: str, state, config: BranchyConfig | None = None,
                    extra: dict | None = None) -> str:
    """Save train state + spec; returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
    _tree_save(path, tree)
    meta = {"extra": extra or {}}
    if config is not None:
        meta["config"] = dataclasses.asdict(config)
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh, indent=2, default=str)
    return path


def _tree_restore_partial(path: str, template: dict) -> dict:
    """Restore only the keys present in ``template`` (Orbax partial restore);
    msgpack fallback restores full then filters."""
    if os.path.exists(path + ".msgpack"):
        from flax import serialization

        with open(path + ".msgpack", "rb") as fh:
            full = serialization.from_bytes(None, fh.read())
        return {k: full[k] for k in template}
    import orbax.checkpoint as ocp

    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    return ckptr.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(item=template, partial_restore=True),
    )


def load_checkpoint(path: str, state, components: tuple[str, ...] | None = None):
    """Restore into a compatible TrainState; returns (state, extra_meta).

    ``components`` restricts restoration (e.g. ``("params", "batch_stats")``
    for evaluation — insulates eval processes from optimizer-state drift);
    None restores everything.
    """
    full_tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
    if components is None:
        restored = _tree_restore(path, full_tree)
    else:
        restored = dict(full_tree)
        restored.update(
            _tree_restore_partial(path, {k: full_tree[k] for k in components})
        )
    extra = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as fh:
            extra = json.load(fh).get("extra", {})
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        rng=restored["rng"],
    )
    return state, extra


def load_config(path: str) -> BranchyConfig | None:
    if not os.path.exists(path + ".json"):
        return None
    with open(path + ".json") as fh:
        meta = json.load(fh)
    cfg = meta.get("config")
    if cfg is None:
        return None
    cfg["segment_ends"] = tuple(cfg["segment_ends"])
    cfg["branch_channels"] = tuple(cfg["branch_channels"])
    if isinstance(cfg.get("img_dim"), list):  # non-square (H, W) round-trips as list
        cfg["img_dim"] = tuple(cfg["img_dim"])
    return BranchyConfig(**cfg)
