"""Multi-exit ("branchy") segmentation losses, TPU-native.

Re-designs /root/reference/branchy_seg_losses.py and funcs.py:40-68 on the
``(E, N, H, W, C)`` stacked-exit layout.  Instead of the reference's Python
loop over exits (branchy_seg_losses.py:24-27) the per-exit loss is computed
with ``jax.vmap`` over the leading exit axis, then combined with an exit
weight vector — one fused dot instead of E sequential kernels.

Reference semantics preserved:

* reduction: per-exit losses reduced mean/sum over their trailing dims, then
  ``dot(weights, losses)``; any other reduction returns the raw (E, ...)
  stack (branchy_seg_losses.py:30-38),
* default weights are ones; user weights are accepted when their length is
  ``n_branches + 1`` (branchy_seg_losses.py:13-16).  (The reference marks
  them ``requires_grad=True`` but never registers them as parameters, so
  they are constants — documented bug #12 in SURVEY.md; here they are
  explicitly static constants.)
* the multi-exit FocalTversky exponent is ``loss**gamma``
  (branchy_seg_losses.py:110) unlike the single-exit ``**(1/gamma)``,
* the multi-exit Tversky argmaxes predictions (branchy_seg_losses.py:88-89),
* multi-exit Lovász sums per-exit losses, optionally weighting with
  ``linspace(0, 1, n_exits+1)[1:]`` when ``prev_out`` is set
  (branchy_seg_losses.py:143-159),
* ``update_n`` renegotiates the exit count after branch placement
  (branchy_seg_losses.py:18-19, used by deepv3_funcs.py:229-232).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ee_semantic_segmentation_tpu.ops import losses as L
from ee_semantic_segmentation_tpu.ops.losses import select_class
from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_softmax


class BrSegLoss:
    """Base multi-exit loss: vmap `_compute_loss` over exits, reduce, weight."""

    def __init__(self, smooth=1e-6, reduction="mean", n_branches=0, weights=None):
        self.smooth = smooth
        self.reduction = reduction
        self.n = n_branches + 1
        self._user_weights = list(weights) if weights else None

    def update_n(self, n):
        self.n = n + 1

    @property
    def weights(self):
        if self._user_weights and len(self._user_weights) == self.n:
            return jnp.asarray(self._user_weights, jnp.float32)
        return jnp.ones((self.n,), jnp.float32)

    def _compute_loss(self, y_pred, targets):  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, y_pred, targets):
        targets = L._squeeze_target(targets)
        n = self.n
        per_exit = jax.vmap(lambda p: self._compute_loss(p, targets))(y_pred[:n])
        if self.reduction == "mean":
            reduced = jnp.mean(per_exit.reshape(n, -1), axis=1)
        elif self.reduction == "sum":
            reduced = jnp.sum(per_exit.reshape(n, -1), axis=1)
        else:
            return per_exit
        return jnp.dot(self.weights, reduced)


class DiceLoss(BrSegLoss):
    def _compute_loss(self, y_pred, targets):
        # branchy_seg_losses.py:41-48 one-hots with exactly C classes (no void
        # crop): soft-dice with plain one-hot.
        C = y_pred.shape[-1]
        probs = jax.nn.softmax(y_pred, axis=-1)
        tgt = jax.nn.one_hot(targets, C, dtype=jnp.float32)
        axes = tuple(range(1, y_pred.ndim))
        num = 2.0 * jnp.sum(probs * tgt, axis=axes) + self.smooth
        den = jnp.sum(probs + tgt, axis=axes) + self.smooth
        return 1.0 - num / den


class JaccardLoss(BrSegLoss):
    def __init__(self, smooth=1e-6, reduction="mean", n_branches=0, downgrad_bg=1.0):
        super().__init__(smooth, reduction, n_branches)
        self.downgrad_bg = downgrad_bg if 0 <= downgrad_bg <= 1.0 else 1.0

    def _compute_loss(self, y_pred, targets):
        iou = L.soft_iou(y_pred, targets, self.smooth)
        if self.downgrad_bg:
            loss = 1.0 - iou
            return loss.at[:, 0].multiply(self.downgrad_bg)
        return jnp.sum(1.0 - iou, axis=-1)


class TverskyLoss(BrSegLoss):
    def __init__(self, smooth=1e-6, alpha=0.5, beta=0.5, reduction="mean", n_branches=1, weights=None):
        super().__init__(smooth, reduction, n_branches, weights)
        self.alpha = alpha
        self.beta = beta

    def _forward_imp(self, y_pred, targets):
        # Multi-exit variant hard-argmaxes predictions (branchy_seg_losses.py:88).
        return 1.0 - L.tversky_index(
            y_pred, targets, self.alpha, self.beta, self.smooth, hard=True
        )

    def _compute_loss(self, y_pred, targets):
        return self._forward_imp(y_pred, targets)


class FocalTverskyLoss(TverskyLoss):
    def __init__(self, smooth=1e-6, alpha=0.5, beta=0.5, gamma=1.0, reduction="mean", n_branches=1, weights=None):
        super().__init__(smooth, alpha, beta, reduction, n_branches, weights)
        self.gamma = gamma

    def _compute_loss(self, y_pred, targets):
        # Multi-exit exponent is gamma itself (branchy_seg_losses.py:110).
        return self._forward_imp(y_pred, targets) ** self.gamma


class FocalLoss(BrSegLoss):
    """Proper pixelwise focal loss (branchy_seg_losses.py:119-131)."""

    def __init__(self, alpha=None, gamma=2.0, smooth=1e-6, reduction="mean", n_branches=1, weights=None):
        super().__init__(smooth, reduction, n_branches, weights)
        self.alpha = None if alpha is None else jnp.asarray(alpha)
        self.gamma = gamma

    def _compute_loss(self, y_pred, targets):
        log_probs = jax.nn.log_softmax(y_pred, axis=-1)
        # clip reproduces take_along_axis's out-of-bounds clamp; the select
        # form avoids the gather's scatter-add VJP (see ops/losses.py)
        pt_log = select_class(log_probs, jnp.clip(targets, 0, y_pred.shape[-1] - 1))
        pt = jnp.exp(pt_log)
        loss = -((1.0 - pt) ** self.gamma) * pt_log
        if self.alpha is not None:
            loss = loss * self.alpha[targets]
        return loss


class LovaszSoftmax:
    """Multi-exit Lovász (branchy_seg_losses.py:133-159): sum of per-exit
    losses, optionally weighted by ``linspace(0,1,n_exits+1)[1:]``."""

    def __init__(self, classes="present", per_image=False, ignore=None, n_branches=0,
                 prev_out=False, max_present=None, exact_fallback=False,
                 hist_bins=None):
        self.classes = classes
        self.per_image = per_image
        self.ignore = ignore
        self.n = n_branches + 1
        self.prev_out = prev_out
        # sort-bound training knob: score only the K most frequent present
        # classes (exact when each image has <= K; see ops/lovasz.py)
        self.max_present = max_present
        # sort-FREE approximation: histogram Lovász with this many error
        # buckets (ops/lovasz.py _hist_class_loss); None = exact sorted path
        self.hist_bins = hist_bins
        # with exact_fallback the compacted path is exact ALWAYS: a
        # lax.cond dispatches the whole multi-exit loss to the all-class
        # path whenever any image (batch, if per_image=False) has more
        # than max_present present classes.  One cond above every vmap —
        # inside a vmap lax.cond lowers to select and would run BOTH
        # paths.  Costs one extra compile of the all-class branch.
        self.exact_fallback = exact_fallback

    def update_n(self, n):
        self.n = n + 1

    @property
    def weights(self):
        if self.prev_out:
            return jnp.asarray(np.linspace(0.0, 1.0, self.n + 1)[1:], jnp.float32)
        return jnp.ones((self.n,), jnp.float32)

    def _loss_with(self, y_pred, targets, max_present):
        per_exit = jax.vmap(
            lambda p: lovasz_softmax(
                p, targets, classes=self.classes, per_image=self.per_image,
                ignore=self.ignore, max_present=max_present,
                hist_bins=self.hist_bins,
            )
        )(y_pred[: self.n])
        if self.prev_out:
            return jnp.dot(self.weights, per_exit)
        return jnp.sum(per_exit)

    def __call__(self, y_pred, targets):
        targets = L._squeeze_target(targets)
        C = y_pred.shape[-1]
        compact = (
            self.classes == "present"
            and self.max_present is not None
            and 0 < self.max_present < C
        )
        if not (compact and self.exact_fallback):
            return self._loss_with(y_pred, targets, self.max_present)

        # present-class census (labels are shared by all exits, so one
        # cond covers the whole multi-exit loss)
        flat = targets.reshape(targets.shape[0], -1)
        valid = (
            jnp.ones_like(flat, jnp.float32)
            if self.ignore is None
            else (flat != self.ignore).astype(jnp.float32)
        )
        if self.per_image:
            counts = jax.vmap(
                lambda l, v: jnp.zeros((C,), jnp.float32).at[l].add(v, mode="drop")
            )(flat, valid)
            n_present = jnp.max(jnp.sum(counts > 0, axis=-1))
        else:
            counts = jnp.zeros((C,), jnp.float32).at[flat.reshape(-1)].add(
                valid.reshape(-1), mode="drop"
            )
            n_present = jnp.sum(counts > 0)
        return jax.lax.cond(
            n_present <= self.max_present,
            lambda yp, t: self._loss_with(yp, t, self.max_present),
            lambda yp, t: self._loss_with(yp, t, None),
            y_pred,
            targets,
        )


class Branchy_loss:
    """Wrap a single-exit loss over a batch-first (N, E, C-last...) stack with
    equal / min_first / max_first exit weighting (funcs.py:40-68).

    Input layout here: ``(N, E, H, W, C)`` (the reference used
    ``(N, E, C, H, W)``).  Returns the per-exit loss vector (E,), optionally
    scaled by the weight mask, exactly like the reference (which returns the
    weighted vector, not a scalar).
    """

    def __init__(self, loss, weight="equal"):
        self.loss = loss
        self.weight = weight

    def __call__(self, output, target):
        n_branches = output.shape[1]
        per_exit = jnp.stack(
            [self.loss(output[:, i], target) for i in range(n_branches)]
        )
        if self.weight == "equal":
            return per_exit
        if self.weight == "min_first":
            mask = jnp.arange(1, n_branches + 1, dtype=jnp.float32) / n_branches
        elif self.weight == "max_first":
            mask = jnp.arange(n_branches, 0, -1, dtype=jnp.float32) / n_branches
        else:
            mask = jnp.ones((n_branches,), jnp.float32)
        return mask * per_exit
