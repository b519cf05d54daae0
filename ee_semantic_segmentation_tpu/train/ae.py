"""Autoencoder training path (targets = inputs).

Mirrors the reference's ``ae_train_epoch`` (/root/reference/
train_funcs.py:37-58): the network reconstructs its own input — an optional
``transform`` corrupts the input fed to the net (denoising AE) while the loss
target stays the clean image; the epoch metric is the reference's
``sum(loss) / numel`` accumulator.

TPU-native: one jitted program per step (forward, loss vs the *clean* input,
backward, SGD), batch sharded over the mesh like the segmentation path.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.parallel import make_mesh, shard_batch
from ee_semantic_segmentation_tpu.parallel.mesh import data_sharding, replicated_sharding
from ee_semantic_segmentation_tpu.utils.logging import log_msg


def make_ae_train_step(model, loss_fn, tx, mesh=None, transform=None):
    """Jitted ``step(state, images, lr) -> (state, metrics)``.

    ``loss_fn(reconstruction, clean_images) -> scalar`` (e.g. registry
    ``get_loss['MSE']``); ``transform`` is an optional jittable input
    corruption (train_funcs.py:46 ``net(transform(X) if transform else X)``).
    """
    ds = data_sharding(mesh) if mesh is not None else None
    rs = replicated_sharding(mesh) if mesh is not None else None
    n_dev = int(mesh.shape["data"]) if mesh is not None else 0

    def step(state, images, lr):
        if n_dev:
            sh = ds if images.shape[0] % n_dev == 0 else rs
            images = jax.lax.with_sharding_constraint(images, sh)
            state = jax.lax.with_sharding_constraint(state, rs)
        rng = jax.random.fold_in(state.rng, state.step)
        inputs = transform(images, rng) if transform else images

        def compute_loss(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs,
                train=True,
                mutable=["batch_stats"],
            )
            # loss vs the CLEAN image (X.detach(), train_funcs.py:47)
            return loss_fn(out, images), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
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

    return jax.jit(step, donate_argnums=(0,))


def ae_train(
    model,
    state,
    step_fn,
    train_loader,
    num_epochs: int,
    *,
    mesh=None,
    lr: float = 0.01,
    scheduler=None,
    use_file=None,
    verbose: bool = False,
    name: str = "ae",
):
    """Epoch loop for autoencoder training; returns (state, epoch_metrics).

    ``epoch_metrics[k]`` is the reference's accumulator value for epoch k:
    sum of batch losses / total input elements (train_funcs.py:52-58).
    """
    mesh = mesh or make_mesh()
    cur_lr = lr
    epoch_metrics = []
    for epoch in range(1, num_epochs + 1):
        t0 = time.perf_counter()
        loss_sum = 0.0
        numel = 0
        for batch in train_loader:
            b = shard_batch(mesh, {"image": batch["image"]})
            state, m = step_fn(state, b["image"], jnp.float32(cur_lr))
            loss_sum += float(m["loss"])
            numel += int(batch["image"].size)
        metric = loss_sum / max(numel, 1)
        epoch_metrics.append(metric)
        dt = time.perf_counter() - t0
        log_msg(
            f"<< {name} progress update >> ae epoch #{epoch}: "
            f"loss/elem = {metric:.3e}, lr = {cur_lr:.6g}, {dt:.2f} s",
            use_file, verbose,
        )
        if scheduler is not None:
            cur_lr = scheduler(epoch, metric)
    return state, epoch_metrics
