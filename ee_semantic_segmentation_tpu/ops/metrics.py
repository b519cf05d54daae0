"""Segmentation metrics: confusion-matrix mIoU, per-image mIoU, PRF metrics.

Re-designs /root/reference/seg_metrics.py and compute_mIoU.py as fixed-shape
JAX ops:

* ``confusion_counts`` vectorizes SegMetric._compute_basics
  (seg_metrics.py:13-28): argmax prediction one-hot vs target one-hot where
  void labels (>= C) become an all-zero target row — so void pixels count as
  FP for the predicted class, exactly like the reference's crop idiom.
* ``mIoU`` mirrors compute_mIoU.py:7-36: a (3, C) TP/FP/FN accumulator,
  ``compute() = mean_c TP_c / (TP_c + FP_c + FN_c)``.  The reference's 0/0
  handling is a no-op (``cIoU == float('nan')`` is always False,
  compute_mIoU.py:35) so empty classes propagate NaN into the mean; that is
  the default here too (``empty_class='nan'``), with opt-in 'one' / 'skip'
  policies for robustness.
* ``img_mIoU`` mirrors compute_mIoU.py:38-63: per-image IoU averaged over the
  classes present in the ground truth (including the void id, which the
  reference's ``unique()`` picks up), then averaged over images.

The accumulator classes are *host-side conveniences*; the pure functions they
call are jit-compiled once and stream device scalars out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ee_semantic_segmentation_tpu.ops.losses import (
    _squeeze_target,
    apply_reduction,
    one_hot_with_void,
)


def _flatten_pixels(y_pred: jnp.ndarray, targets: jnp.ndarray):
    """-> pred labels (N, P) int, target labels (N, P) int."""
    N = y_pred.shape[0]
    pred = jnp.argmax(y_pred, axis=-1).reshape(N, -1)
    tgt = _squeeze_target(targets).reshape(N, -1)
    return pred, tgt


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_counts(y_pred: jnp.ndarray, targets: jnp.ndarray, num_classes: int | None = None):
    """Per-sample per-class (TP, FP, FN), each (N, C) float32.

    y_pred: (N, H, W, C) logits (softmax+argmax as in seg_metrics.py:16) or an
    already-argmaxed integer map (N, H, W).
    """
    if y_pred.ndim >= 3 and not jnp.issubdtype(y_pred.dtype, jnp.integer):
        C = num_classes or y_pred.shape[-1]
        pred, tgt = _flatten_pixels(y_pred, targets)
    else:
        assert num_classes is not None, "num_classes required for label-map input"
        C = num_classes
        pred = _squeeze_target(y_pred).reshape(y_pred.shape[0], -1)
        tgt = _squeeze_target(targets).reshape(targets.shape[0], -1)

    pred_oh = jax.nn.one_hot(pred, C, dtype=jnp.float32)
    tgt_oh = one_hot_with_void(tgt, C)
    tp = jnp.sum(pred_oh * tgt_oh, axis=1)
    fp = jnp.sum(pred_oh * (1.0 - tgt_oh), axis=1)
    fn = jnp.sum((1.0 - pred_oh) * tgt_oh, axis=1)
    return tp, fp, fn


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_update(y_pred, targets, num_classes: int):
    """(3, C) batch-summed confusion counts — one fused device pass."""
    tp, fp, fn = confusion_counts(y_pred, targets, num_classes)
    return jnp.stack([tp.sum(0), fp.sum(0), fn.sum(0)])


class mIoU:
    """Streaming dataset-level mIoU (compute_mIoU.py:7-36)."""

    def __init__(self, n_classes: int, empty_class: str = "nan"):
        self.C = n_classes
        self.empty_class = empty_class
        self.reset()

    def reset(self):
        self.accumulator = np.zeros((3, self.C), np.float64)

    def __call__(self, y_pred, targets):
        self.accumulator += np.asarray(
            confusion_update(y_pred, targets, num_classes=self.C), np.float64
        )

    update = __call__

    def compute(self) -> float:
        tp = self.accumulator[0]
        den = self.accumulator.sum(axis=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            ciou = tp / den
        if self.empty_class == "one":
            ciou = np.where(den > 0, ciou, 1.0)
        elif self.empty_class == "skip":
            ciou = ciou[den > 0]
            return float(np.mean(ciou)) if ciou.size else float("nan")
        # 'nan': NaN propagates, matching the reference (compute_mIoU.py:35).
        return float(np.sum(ciou) / self.C)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _img_miou_one(pred: jnp.ndarray, tgt: jnp.ndarray, num_classes: int):
    """Mean IoU over classes present in the GT of ONE image
    (compute_mIoU.py:43-57).  ``num_classes`` must cover the void id (VOC:
    22) because the reference's ``unique()`` includes it."""
    cls = jnp.arange(num_classes)
    gt = (tgt[None, :] == cls[:, None]).astype(jnp.float32)  # (C, P)
    pr = (pred[None, :] == cls[:, None]).astype(jnp.float32)
    inter = jnp.sum(gt * pr, axis=1)
    union = jnp.sum(jnp.clip(gt + pr, 0.0, 1.0), axis=1)
    present = jnp.sum(gt, axis=1) > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1.0), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)


class img_mIoU:
    """Streaming per-image mIoU (compute_mIoU.py:38-63)."""

    def __init__(self, num_classes: int = 22):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.total = 0.0
        self.count = 0

    def __call__(self, y_pred, target):
        if y_pred.ndim == 4:  # (N, H, W, C) logits, N == 1
            pred = jnp.argmax(y_pred, axis=-1).reshape(-1)
        else:
            pred = _squeeze_target(y_pred).reshape(-1)
        tgt = _squeeze_target(target).reshape(-1)
        self.total += float(_img_miou_one(pred, tgt, self.num_classes))
        self.count += 1

    def add_score(self, value: float, n: int = 1):
        """Fold in already-computed per-image scores (the batched on-device
        evaluators compute ``_img_miou_one`` inside their fused program and
        stream scalars out — ee/batch_eval.br_evaluator_similarity)."""
        self.total += float(value)
        self.count += n

    def compute(self) -> float:
        return self.total / self.count if self.count > 0 else float("nan")


class SegMetric:
    """Base for reduction-style metrics (seg_metrics.py:8-28)."""

    def __init__(self, smooth=1e-6, reduction="mean", avg="macro"):
        self.smooth = smooth
        self.reduction = reduction
        self.avg = avg

    def _compute_basics(self, y_pred, targets):
        C = y_pred.shape[-1]
        return confusion_counts(y_pred, targets, num_classes=C)

    def _compute_loss(self, y_pred, targets):  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, y_pred, targets):
        return apply_reduction(self._compute_loss(y_pred, _squeeze_target(targets)), self.reduction)


class Recall(SegMetric):
    def _compute_loss(self, y_pred, targets):
        tp, _, fn = self._compute_basics(y_pred, targets)
        if self.avg == "macro":
            return jnp.mean((tp + self.smooth) / (tp + fn + self.smooth), axis=-1)
        if self.avg == "micro":
            tp, fn = tp.sum(-1), fn.sum(-1)
        return (tp + self.smooth) / (tp + fn + self.smooth)


class Precision(SegMetric):
    def _compute_loss(self, y_pred, targets):
        tp, fp, _ = self._compute_basics(y_pred, targets)
        if self.avg == "macro":
            return jnp.mean((tp + self.smooth) / (tp + fp + self.smooth), axis=-1)
        if self.avg == "micro":
            tp, fp = tp.sum(-1), fp.sum(-1)
        return (tp + self.smooth) / (tp + fp + self.smooth)


class F_beta(SegMetric):
    def __init__(self, beta=1.0, smooth=1e-6, reduction="mean", avg="macro"):
        super().__init__(smooth, reduction, avg)
        self.beta = beta

    def _compute_loss(self, y_pred, targets):
        tp, fp, fn = self._compute_basics(y_pred, targets)
        b2 = self.beta**2
        if self.avg == "macro":
            return jnp.mean(
                ((1 + b2) * tp + self.smooth) / ((1 + b2) * tp + b2 * fn + fp + self.smooth),
                axis=-1,
            )
        if self.avg == "micro":
            tp, fp, fn = tp.sum(-1), fp.sum(-1), fn.sum(-1)
        return ((1 + b2) * tp + self.smooth) / ((1 + b2) * tp + b2 * fn + fp + self.smooth)


class Accuracy(SegMetric):
    def _compute_loss(self, y_pred, targets):
        pred, tgt = _flatten_pixels(y_pred, targets)
        return jnp.mean((pred == tgt).astype(jnp.float32), axis=1)
