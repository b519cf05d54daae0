"""AOT serving artifacts: compile-once, deploy-anywhere via ``jax.export``.

The reference deploys by pickling the whole torch module and re-executing
Python at load time (``tch.save(net, ...)`` deepv3_funcs.py:186-188, loaded
by every eval CLI, e.g. eval_mIoU.py:94).  The TPU-native equivalent is an
*ahead-of-time exported program*: the eval forward (or the whole gated
early-exit engine) is staged, lowered to StableHLO with the trained weights
baked in as constants, and serialized to one self-contained artifact.  A
server then deserializes and runs it with **no model code, no Python class
definitions, and no retrace/recompile** — only jax and the artifact bytes.

Artifact layout (``save_exported``):

* ``<path>.stablehlo`` — the serialized ``jax.export.Exported`` blob;
* ``<path>.json``      — a small manifest (input shape/dtype, output names,
  export platforms, builder metadata) for humans and load-time checks.

Platforms: by default the artifact is exported for the platform it was
built on plus CPU (``platforms=("tpu", "cpu")`` on a TPU host), so the same
blob serves on a TPU pod and in a CPU canary.  The Pallas-head variants are
single-platform (Mosaic kernels only lower for TPU) — pass
``platforms=("tpu",)`` when exporting with ``pallas_head=True``.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _default_platforms() -> tuple[str, ...]:
    backend = jax.default_backend()
    return (backend, "cpu") if backend != "cpu" else ("cpu",)


def export_fn(
    fn: Callable,
    example_args: Sequence,
    platforms: Sequence[str] | None = None,
):
    """Export ``fn(*example_args)`` to a :class:`jax.export.Exported`.

    ``example_args`` fix the static shapes/dtypes (only their avals are
    used); pass :class:`jax.ShapeDtypeStruct` leaves directly to use
    symbolic dimensions (shape polymorphism).  Weights referenced by
    closure are baked into the artifact as constants.
    """
    platforms = tuple(platforms) if platforms else _default_platforms()
    specs = jax.tree.map(
        lambda a: a if isinstance(a, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        tuple(example_args),
    )
    return jax.export.export(jax.jit(fn), platforms=list(platforms))(*specs)


def _batch_dim(batch_size: int | None):
    """A concrete leading dim, or the symbolic 'b' when ``batch_size`` is
    None — the exported artifact then serves ANY batch size (XLA compiles
    one program per distinct size at serving time, from the same blob)."""
    if batch_size is not None:
        return int(batch_size)
    (b,) = jax.export.symbolic_shape("b")
    return b


def export_eval_forward(
    model,
    variables,
    batch_size: int | None,
    platforms: Sequence[str] | None = None,
):
    """Export the stacked all-exits eval forward ``images -> (E, N, H, W, C)``
    logits with the weights baked in (the batched evaluators' workload,
    eval_mIoU.py:15-40).

    ``batch_size=None`` exports with a SYMBOLIC batch dimension: one
    artifact serves any batch size (shape polymorphism; per-size XLA
    compiles happen lazily at serving time)."""
    H, W = model.config.img_hw

    def fwd(images):
        return model.apply(variables, images, train=False)

    x = jax.ShapeDtypeStruct((_batch_dim(batch_size), H, W, 3), jnp.float32)
    return export_fn(fwd, (x,), platforms)


def export_gated(
    model,
    variables,
    batch_size: int | None,
    *,
    tau: float,
    metric: str = "ent",
    skip: int = 0,
    n_classes: int = 21,
    pallas_head: bool = False,
    platforms: Sequence[str] | None = None,
):
    """Export the full masked gated early-exit engine
    ``images -> (labels (N,H,W) i32, exit_idx (N,) i32)`` — one program with
    the gate policy AND weights baked in (the serving counterpart of
    ee_dnn_op_ne.py's per-image loop).  ``batch_size=None`` exports a
    symbolic batch dimension (not supported with ``pallas_head=True`` —
    Mosaic kernels need static shapes)."""
    from ee_semantic_segmentation_tpu.ee.masked import _gated_forward_fn

    H, W = model.config.img_hw
    if batch_size is None and pallas_head:
        raise ValueError("symbolic batch (batch_size=None) is incompatible "
                         "with pallas_head=True: Mosaic needs static shapes")
    fn = _gated_forward_fn(
        model, variables, tau=tau, n_classes=n_classes, skip=skip,
        pool="none", pool_size=1, pallas_head=pallas_head, metric=metric,
    )
    x = jax.ShapeDtypeStruct((_batch_dim(batch_size), H, W, 3), jnp.float32)
    return export_fn(fn, (x,), platforms)


def save_exported(exp, path: str, manifest: dict | None = None) -> str:
    """Serialize an Exported to ``<path>.stablehlo`` + ``<path>.json``."""
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path + ".stablehlo", "wb") as fh:
        fh.write(blob)
    man = {
        "fn_name": exp.fun_name,
        "platforms": list(exp.platforms),
        "in_avals": [
            {"shape": [d if isinstance(d, int) else str(d) for d in a.shape],
             "dtype": str(a.dtype)}
            for a in exp.in_avals
        ],
        "out_avals": [
            {"shape": [d if isinstance(d, int) else str(d) for d in a.shape],
             "dtype": str(a.dtype)}
            for a in exp.out_avals
        ],
        "calling_convention_version": exp.calling_convention_version,
        "bytes": len(blob),
    }
    man.update(manifest or {})
    with open(path + ".json", "w") as fh:
        json.dump(man, fh, indent=1)
    return path + ".stablehlo"


def load_exported(path: str):
    """Deserialize ``<path>.stablehlo`` back into a callable Exported.

    Run it with ``exp.call(*args)`` (re-jit on the current backend is a
    cached lookup, not a recompile of the module body)."""
    if not path.endswith(".stablehlo"):
        path = path + ".stablehlo"
    if not os.path.exists(path):
        raise FileNotFoundError(f"no exported artifact at {path}")
    with open(path, "rb") as fh:
        blob = fh.read()
    return jax.export.deserialize(blob)


def manifest_for(path: str) -> dict:
    base = path[: -len(".stablehlo")] if path.endswith(".stablehlo") else path
    with open(base + ".json") as fh:
        return json.load(fh)
