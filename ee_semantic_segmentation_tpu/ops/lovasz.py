"""Lovász-Softmax loss, TPU-native.

Re-implements the semantics of the vendored Berman implementation used by the
reference (/root/reference/lovaszsoftmax.py:19-31,154-219) as a *fixed-shape
masked* computation:

* The reference removes void pixels by boolean indexing
  (``flatten_probas``, lovaszsoftmax.py:203-219), which is dynamic-shaped and
  cannot compile on TPU.  Here void pixels keep their slots: their error is
  forced below every valid error so a single descending ``argsort`` pushes
  them to the tail, and their gradient/error contributions are masked to zero.
  The Lovász extension value is invariant to permutations within tied errors,
  so this matches the reference bit-for-bit up to float association.
* ``classes='present'`` (skip classes absent from the ground truth,
  lovaszsoftmax.py:186-187) becomes a presence mask + safe mean instead of a
  Python ``continue``.

The reference feeds **raw logits** straight into ``lovasz_softmax`` (its
training loss wrapper never applies softmax, branchy_seg_losses.py:151-159);
``apply_softmax=False`` reproduces that, ``apply_softmax=True`` gives the
textbook loss.

Layout: channels-last. ``probas`` is ``(N, H, W, C)`` (or ``(P, C)`` for the
flat form), ``labels`` is integer ``(N, H, W)`` / ``(P,)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def lovasz_grad(gt_sorted: jnp.ndarray, valid_sorted: jnp.ndarray | None = None) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors.

    Mirrors lovaszsoftmax.py:19-31 with an optional validity mask: invalid
    slots (void pixels pushed to the tail of the sort) contribute nothing to
    the cumulative sums and get a zero gradient.

    Args:
      gt_sorted: (P,) float — foreground indicator sorted by decreasing error.
      valid_sorted: (P,) float or None — 1.0 where the slot is a real pixel.

    Returns:
      (P,) float gradient.
    """
    gt_sorted = gt_sorted.astype(jnp.float32)
    if valid_sorted is None:
        valid_sorted = jnp.ones_like(gt_sorted)
    else:
        valid_sorted = valid_sorted.astype(jnp.float32)
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(valid_sorted - gt_sorted)
    # 0/0 only happens in the all-void / empty-foreground-prefix corner; the
    # reference would divide by a positive union because it drops voids first.
    jaccard = 1.0 - jnp.where(union > 0, intersection / union, 0.0)
    delta = jnp.diff(jaccard, prepend=0.0)
    # jaccard[0] must be kept as-is (cover-1-pixel case, lovaszsoftmax.py:29-30)
    # which `prepend=0.0` already does since jaccard[0] - 0 = jaccard[0].
    return delta * valid_sorted


@jax.custom_vjp
def _class_loss(errors: jnp.ndarray, fg: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Lovász loss for one class over flat pixels, masked fixed-shape.

    errors: (P,) raw |fg - pred| with void slots already at ``_NEG_BIG``.
    fg:     (P,) float foreground indicator (0 on void slots).
    valid:  (P,) float validity indicator.

    Custom VJP: d loss / d errors[p] = lovasz_grad[rank(p)] (the Lovász
    weight vector is treated as constant, exactly like the reference's
    ``Variable(grad)`` detach, lovaszsoftmax.py:199).  XLA's default
    sort-VJP materializes that as a random scatter — slow on TPU; here the
    backward *unsorts with a second sort* keyed on the saved permutation
    (sorts are fast, scatters are not).
    """
    loss, _ = _class_loss_fwd_impl(errors, fg, valid)
    return loss


def _class_loss_fwd_impl(errors, fg, valid):
    # fg/valid packed into one f32 operand (fg implies valid: {0: void,
    # 1: valid bg, 3: valid fg}); iota carried for the backward unsort.
    # (An int32 position<<2|flags single-payload variant compiled fine on
    # CPU but hung the TPU compiler — kept to three operands.)
    P = errors.shape[0]
    packed = fg * 2.0 + valid
    iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    neg_err, packed_s, perm = jax.lax.sort((-errors, packed, iota), num_keys=1)
    errors_sorted = -neg_err
    fg_s = (packed_s > 2.0).astype(jnp.float32)
    valid_s = (packed_s > 0.0).astype(jnp.float32)
    grad = lovasz_grad(fg_s, valid_s)
    errors_sorted = jnp.where(valid_s > 0, errors_sorted, 0.0)
    loss = jnp.dot(errors_sorted, grad)
    return loss, (perm, grad * valid_s)


def _class_loss_fwd(errors, fg, valid):
    loss, res = _class_loss_fwd_impl(errors, fg, valid)
    return loss, res


def _class_loss_bwd(res, ct):
    perm, grad_sorted = res
    # unsort: ascending sort by original position restores pixel order
    _, d_err = jax.lax.sort((perm, grad_sorted * ct), num_keys=1)
    zeros = jnp.zeros_like(d_err)
    return d_err, zeros, zeros


_class_loss.defvjp(_class_loss_fwd, _class_loss_bwd)


def lovasz_softmax_flat(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    classes: str | tuple = "present",
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-class Lovász-Softmax on flat pixels (lovaszsoftmax.py:172-200).

    Args:
      probas: (P, C) class scores (probabilities, or raw logits to match the
        reference's training usage).
      labels: (P,) int ground-truth labels.
      classes: 'present' | 'all' | explicit tuple/list of class ids.
      valid: (P,) bool — False marks void pixels (already folded in by
        :func:`lovasz_softmax`); None means all valid.

    Returns: scalar loss.
    """
    P, C = probas.shape
    probas = jnp.asarray(probas, jnp.float32)
    labels = jnp.asarray(labels)
    if valid is None:
        valid_f = jnp.ones((P,), jnp.float32)
    else:
        valid_f = jnp.asarray(valid, jnp.float32)

    if isinstance(classes, str):
        class_ids = jnp.arange(C)
    else:
        class_ids = jnp.asarray(tuple(classes), jnp.int32)

    def per_class(c):
        fg = ((labels == c) & (valid_f > 0)).astype(jnp.float32)
        pred = probas[:, c]
        errors = jnp.where(valid_f > 0, jnp.abs(fg - pred), _NEG_BIG)
        return _class_loss(errors, fg, valid_f), jnp.sum(fg) > 0

    losses, present = jax.vmap(per_class)(class_ids)

    if classes == "present":
        n_present = jnp.sum(present.astype(jnp.float32))
        return jnp.where(
            n_present > 0,
            jnp.sum(jnp.where(present, losses, 0.0)) / jnp.maximum(n_present, 1.0),
            0.0,
        )
    return jnp.mean(losses)


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    classes: str | tuple = "present",
    per_image: bool = False,
    ignore: int | None = None,
    apply_softmax: bool = False,
) -> jnp.ndarray:
    """Multi-class Lovász-Softmax loss (lovaszsoftmax.py:154-169), NHWC.

    Args:
      probas: (N, H, W, C) scores — raw logits by default, matching how the
        reference's training loss calls this (branchy_seg_losses.py:151-159);
        set ``apply_softmax=True`` for the textbook probability form.
      labels: (N, H, W) int ground truth.
      classes: 'present' | 'all' | sequence of class ids.
      per_image: average of per-image flat losses instead of one flat batch.
      ignore: void label id filtered from the computation (masked, not
        dropped — fixed shapes for TPU).
    """
    if probas.ndim == 3:  # (N, H, W) sigmoid-style -> single channel
        probas = probas[..., None]
    N, H, W, C = probas.shape
    if apply_softmax:
        probas = jax.nn.softmax(probas, axis=-1)
    flat_p = probas.reshape(N, H * W, C)
    flat_l = labels.reshape(N, H * W)
    valid = jnp.ones_like(flat_l, dtype=bool) if ignore is None else (flat_l != ignore)

    if per_image:
        f = functools.partial(lovasz_softmax_flat, classes=classes)
        losses = jax.vmap(lambda p, l, v: f(p, l, valid=v))(flat_p, flat_l, valid)
        return jnp.mean(losses)
    return lovasz_softmax_flat(
        flat_p.reshape(-1, C), flat_l.reshape(-1), classes=classes, valid=valid.reshape(-1)
    )
