"""Jitted, mesh-sharded train and eval steps.

One XLA program per (model, loss): forward over all exits, loss, backward,
SGD update — fused end-to-end, batch sharded over the 'data' axis, params
replicated.  Gradient all-reduce is inserted by GSPMD through the sharded
autodiff (no hand-written collectives; they ride ICI).

The scalar learning rate is a runtime argument (host schedulers change it
per epoch without recompiling, unlike the reference's per-epoch torch
scheduler machinery in deepv3_funcs.py:138-156).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ee_semantic_segmentation_tpu.parallel.mesh import (
    batch_space_sharding,
    data_sharding,
    make_mesh,
    replicated_sharding,
    space_size,
)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


def create_train_state(model, tx, rng, sample_input, mesh=None) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))
    return state


def make_train_step(
    model,
    loss_fn: Callable,
    tx,
    mesh=None,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Returns jitted ``step(state, images, labels, lr) -> (state, metrics)``.

    loss_fn(stacked_logits (E,N,H,W,C) | (N,H,W,C), labels) -> scalar.

    ``accum_steps=A > 1`` runs gradient accumulation INSIDE the one jitted
    program: the macro-batch (B, ...) is reshaped to (A, B/A, ...) and a
    ``lax.scan`` computes value+grad per micro-batch, summing gradients on
    device and applying ONE optimizer update with the mean gradient.  Only
    one micro-batch's activations are live at a time, so peak HBM scales
    with B/A — this is what lets full-res (2048x1024) training exceed the
    single-chip b2 envelope (b4 OOMs without accumulation; see STATUS.md).
    Semantics notes (both match torch-style accumulation):
      * the mean of micro-batch losses equals the macro-batch loss exactly
        for per-image-mean losses (per-image Lovász, CE); per-BATCH Lovász
        sorts each micro-batch separately, so its accumulated gradient is
        the mean of A smaller-batch gradients, not the joint-batch one;
      * BatchNorm batch stats are computed per micro-batch (the running
        averages advance A times per macro step).
    Macro-batches whose leading dim is not divisible by A (e.g. a padded
    final batch under a different static shape) fall back to the plain
    single-pass body for that shape's trace.
    """

    # Commit shardings *inside* the program (with_sharding_constraint) so
    # correctness does not depend on callers pre-committing via shard_batch:
    # batch sharded along 'data' (GSPMD inserts the psum gradient all-reduce
    # through the sharded autodiff), params/opt replicated.  On a 2-D
    # ('data', 'space') mesh the image-height dim is additionally sharded
    # over 'space' — GSPMD materializes conv/pool halo exchanges at shard
    # edges as ICI collective-permutes, which is what makes full-res
    # (2048x1024) training fit: per-device activation footprint scales as
    # 1/(dp*sp).  Shapes are static at trace time, so an uneven batch (or a
    # height that does not divide sp) simply falls back to the next-coarser
    # sharding (correct, with shard_batch's one-time warning) instead of
    # erroring.
    ds = data_sharding(mesh) if mesh is not None else None
    rs = replicated_sharding(mesh) if mesh is not None else None
    n_dev = int(mesh.shape["data"]) if mesh is not None else 0
    n_sp = space_size(mesh) if mesh is not None else 1
    dss = batch_space_sharding(mesh) if (mesh is not None and n_sp > 1) else None

    def commit_batch(x):
        if n_dev == 0:
            return x
        if x.shape[0] % n_dev:
            sh = rs
        elif dss is not None and x.ndim >= 2 and x.shape[1] % n_sp == 0:
            sh = dss
        else:
            sh = ds
        return jax.lax.with_sharding_constraint(x, sh)

    A = max(int(accum_steps or 1), 1)

    def compute_loss(params, stats, images, labels, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return loss_fn(out, labels), mutated["batch_stats"]

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    def step(state: TrainState, images, labels, lr):
        if n_dev:
            state = jax.lax.with_sharding_constraint(state, rs)
        rng = jax.random.fold_in(state.rng, state.step)

        if A > 1 and images.shape[0] % A == 0:
            mb = images.shape[0] // A
            im = images.reshape(A, mb, *images.shape[1:])
            lb = labels.reshape(A, mb, *labels.shape[1:])

            def micro(carry, xs):
                stats, gsum, lsum, i = carry
                images_i, labels_i = xs
                images_i = commit_batch(images_i)
                labels_i = commit_batch(labels_i)
                (loss_i, stats), grads_i = grad_fn(
                    state.params, stats, images_i, labels_i,
                    jax.random.fold_in(rng, i),
                )
                gsum = jax.tree.map(jnp.add, gsum, grads_i)
                return (stats, gsum, lsum + loss_i, i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, gsum, lsum, _), _ = jax.lax.scan(
                micro,
                (state.batch_stats, zeros, jnp.float32(0.0), jnp.int32(0)),
                (im, lb),
            )
            grads = jax.tree.map(lambda g: g / A, gsum)
            loss = lsum / A
        else:
            images = commit_batch(images)
            labels = commit_batch(labels)
            (loss, new_stats), grads = grad_fn(
                state.params, state.batch_stats, images, labels, rng
            )

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + lr * u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step, **kwargs)


def make_eval_step(model, mesh=None):
    """Jitted full multi-exit forward in eval mode -> (E, N, H, W, C).

    When a mesh is given, the input batch is committed to the 'data' axis
    (plus 'space' over H on a 2-D mesh) inside the program; uneven batches
    fall back to the next-coarser sharding."""
    ds = data_sharding(mesh) if mesh is not None else None
    rs = replicated_sharding(mesh) if mesh is not None else None
    n_dev = int(mesh.shape["data"]) if mesh is not None else 0
    n_sp = space_size(mesh) if mesh is not None else 1
    dss = batch_space_sharding(mesh) if (mesh is not None and n_sp > 1) else None

    def fwd(params, batch_stats, images):
        if n_dev:
            if images.shape[0] % n_dev:
                sh = rs
            elif dss is not None and images.shape[1] % n_sp == 0:
                sh = dss
            else:
                sh = ds
            images = jax.lax.with_sharding_constraint(images, sh)
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )

    return jax.jit(fwd)
