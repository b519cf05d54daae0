"""Pixelwise cross-entropy with ignore_index, single- and multi-exit.

Re-designs /root/reference/my_pixelwise_xentropy.py for TPU: torch's
``CrossEntropyLoss(ignore_index=...)`` boolean filtering becomes a static
mask; reduction 'mean' divides by the number of *non-ignored* pixels exactly
like torch.

Layout: logits ``(N, H, W, C)`` (or any ``(..., C)``), integer targets of the
matching leading shape.  Multi-exit logits ``(E, N, H, W, C)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.ops.losses import _squeeze_target, select_class


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -100,
    reduction: str | None = "mean",
) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss semantics on channels-last logits.

    'mean' averages over non-ignored pixels (torch's weighted-mean contract);
    'sum' sums them; None returns the per-pixel map with ignored pixels at 0.
    """
    targets = targets.astype(jnp.int32)
    valid = targets != ignore_index
    # Clip so the gather is in-bounds for ignored labels (e.g. void=21, C=21).
    safe_t = jnp.clip(targets, 0, logits.shape[-1] - 1)
    acc = jnp.promote_types(logits.dtype, jnp.float32)  # >= f32; keeps f64
    log_probs = jax.nn.log_softmax(logits.astype(acc), axis=-1)
    # select_class, not take_along_axis: the gather's scatter-add VJP was
    # 360 ms of the 655 ms CE train step at 512² b16 (see ops/losses.py).
    nll = -select_class(log_probs, safe_t)
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "mean":
        count = jnp.sum(valid.astype(acc))
        return jnp.sum(nll) / jnp.maximum(count, 1.0)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


class BrXEntropyLoss:
    """Multi-exit CE (my_pixelwise_xentropy.py:19-46).

    Per-exit scalar CE (each with the inner ``reduction``), optional per-exit
    weights, then ``b_reduction`` in {'sum', 'mean', None} across exits.
    ``n_exits == 0`` degrades to plain single-exit CE.
    """

    def __init__(self, reduction="mean", ignore_index=-100, b_reduction="mean", n_exits=0, weights=None):
        self.reduction = reduction
        self.ignore_index = ignore_index
        self.b_reduction = b_reduction
        self.n_exits = n_exits
        if weights and n_exits and len(weights) == n_exits:
            self.weights = jnp.asarray(weights, jnp.float32)
        else:
            self.weights = None

    def update_n(self, n):
        """Renegotiated exit count (mirrors BrSegLoss.update_n usage from
        deepv3_funcs.py:229-232; n is the branch count, exits = n + 1)."""
        self.n_exits = n + 1

    def __call__(self, y_pred, targets):
        targets = _squeeze_target(targets)
        if not self.n_exits:
            return cross_entropy(y_pred, targets, self.ignore_index, self.reduction)
        assert self.n_exits <= y_pred.shape[0]
        losses = jax.vmap(
            lambda p: cross_entropy(p, targets, self.ignore_index, self.reduction)
        )(y_pred[: self.n_exits])
        if self.weights is not None:
            losses = losses * self.weights
        if self.b_reduction == "sum":
            return jnp.sum(losses)
        if self.b_reduction == "mean":
            return jnp.mean(losses)
        return losses
