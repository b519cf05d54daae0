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
import os

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def _sort2(key: jnp.ndarray, pay: jnp.ndarray):
    """Ascending 2-operand sort of flat (P,) arrays.

    Backend: the VMEM-resident Pallas bitonic kernel on TPU when P is a
    power of two (ops/pallas/sort_kernel.py — the Lovász training step is
    sort-bound, VERDICT #4), XLA's lax.sort otherwise.  Override with
    EE_TPU_LOVASZ_SORT=xla|pallas.  Bitonic is unstable: within exactly
    tied keys the payload order may differ from lax.sort — the Lovász value
    is tie-invariant (docstring above) so only per-pixel gradient
    attribution within exact ties can differ.
    """
    from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import sortable

    # Measured on one v5e chip (256² b16 per-image Lovász step): 77.5 img/s
    # with the pallas sort vs 57.7 with lax.sort; standalone 336x65536:
    # 62 vs 86 us/row.  Keys match lax.sort exactly; tie order may differ.
    # Chunked rows (P > 2^16, round-3 re-measurement with
    # tools/bench_sort_compile.py): Lovász value+grad at 2^18 b16 runs
    # 1.30x faster than lax.sort (260 vs 339 ms) AND compiles faster
    # (100 vs 111 s — XLA builds the Mosaic kernels in parallel inside one
    # program; round 2's "~20 min first compile" was sequential standalone
    # kernel builds and is obsolete), so auto engages every sortable() size.
    mode = os.environ.get("EE_TPU_LOVASZ_SORT", "auto")
    P = key.shape[-1]
    use_pallas = sortable(P) and (
        mode == "pallas" or (mode == "auto" and jax.default_backend() == "tpu")
    )
    if use_pallas:
        from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import sort_pallas

        k, p = sort_pallas(key[None], pay[None])
        return k[0], p[0]
    return jax.lax.sort((key, pay), num_keys=1)


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
    gt_sorted = gt_sorted.astype(jnp.promote_types(gt_sorted.dtype, jnp.float32))
    if valid_sorted is None:
        valid_sorted = jnp.ones_like(gt_sorted)
    else:
        valid_sorted = valid_sorted.astype(gt_sorted.dtype)
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
    backward *unsorts with a second sort* keyed on the saved permutation.
    Measured at the 512² training shape (1008 rows of 2^18, one v5e chip):
    unsort-by-sort 301 ms vs permutation scatter 2176 ms vs inverse-perm
    gather 3927 ms — sorts beat TPU scatter/gather by 7-13x here.
    """
    loss, _ = _class_loss_fwd_impl(errors, fg, valid)
    return loss


def _class_loss_fwd_impl(errors, fg, valid):
    # Sort bytes dominate the training step, so keep operands minimal: when
    # the max packed value 4*(P-1) + 3 = 4P - 1 fits exactly in a float32
    # integer (4P - 1 <= 2^24, true for every per-image resolution up to and
    # including 2048x2048 = 2^22 pixels), pack the position AND the fg/valid
    # flags into ONE f32 payload -> a 2-operand sort instead of 3 (1/3 less
    # HBM traffic through the sort network).
    # (An int32 position<<2|flags single-payload variant compiled fine on
    # CPU but hung the TPU compiler — f32 payloads avoid that path.)
    P = errors.shape[0]
    if 4 * P - 1 <= (1 << 24):
        iota_f = jax.lax.broadcasted_iota(jnp.float32, (P, 1), 0)[:, 0]
        pay = iota_f * 4.0 + fg * 2.0 + valid
        neg_err, pay_s = _sort2(-errors, pay)
        pay_i = pay_s.astype(jnp.int32)
        # keep the saved permutation in f32 (exact: perm < 2^22 here): the
        # backward unsort then reuses the SAME f32-key sort kernel as the
        # forward instead of instantiating an int32-key variant — halves the
        # ~200 s/kernel Mosaic compile cost (tools/bench_sort_compile.py).
        perm = jax.lax.shift_right_logical(pay_i, jnp.int32(2)).astype(jnp.float32)
        fg_s = ((pay_i & 2) >> 1).astype(jnp.float32)
        valid_s = (pay_i & 1).astype(jnp.float32)
    else:  # huge flat-batch case: positions no longer exact in f32
        packed = fg * 2.0 + valid
        iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
        neg_err, packed_s, perm = jax.lax.sort((-errors, packed, iota), num_keys=1)
        fg_s = (packed_s > 2.0).astype(jnp.float32)
        valid_s = (packed_s > 0.0).astype(jnp.float32)
    errors_sorted = -neg_err
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
    _, d_err = _sort2(perm, grad_sorted * ct)
    zeros = jnp.zeros_like(d_err)
    return d_err, zeros, zeros


_class_loss.defvjp(_class_loss_fwd, _class_loss_bwd)


# --------------------------------------------------- sort-free histogram path
#
# The Lovász weight vector ``lovasz_grad`` telescopes over runs of equal
# errors: sum_j e_(j) * (J_j - J_{j-1}) only changes J at rank boundaries, so
# with errors bucketed into ``bins`` uniform-width descending error bins the
# whole sorted computation reduces to four weighted bucket histograms +
# O(bins) math — no sort at all.  Within a bucket the (arbitrary, tie-like)
# order is taken as foreground-first, and every pixel of a group gets that
# group's MEAN Jaccard step, which keeps the summed gradient exact per bucket.
# The loss error is bounded by (max_err - min_err) / bins — the bound relies
# on the uniform bin width (the J sequence is monotone with total variation
# <= 1); measured agreement is far tighter (~1e-6 at
# bins=1024 on uniform errors, tests/test_hist_lovasz.py).  APPROXIMATE — opt-in
# via ``hist_bins`` (train CLI -G); the sorted path stays the reference-exact
# default.  Replaces lovaszsoftmax.py:19-31's sort+cumsum with TPU-native
# histogram MACs (ops/pallas/hist_kernel.py).


def _hist_prepass(errors, valid, bins):
    """Per-row (emax, inv_bucket_width) over valid errors; zeros if none."""
    emax = jnp.max(jnp.where(valid > 0, errors, -jnp.inf))
    emin = jnp.min(jnp.where(valid > 0, errors, jnp.inf))
    any_valid = jnp.sum(valid) > 0
    rng = jnp.maximum(emax - emin, 1e-12)
    emax = jnp.where(any_valid, emax, 0.0)
    inv_w = jnp.where(any_valid, bins / rng, 0.0)
    return emax, inv_w


def _hist_class_loss_impl(bins, errors, fg, valid):
    from ee_semantic_segmentation_tpu.ops.pallas.hist_kernel import hist2d_weighted

    emax, inv_w = _hist_prepass(errors, valid, bins)

    hist = hist2d_weighted(
        errors[None], (fg * valid)[None], emax[None], inv_w[None], bins=bins
    )[0]
    n, f, S, Sf = hist
    gts = jnp.sum(f)
    N_end = jnp.cumsum(n)
    F_end = jnp.cumsum(f)
    N_start = N_end - n
    F_start = F_end - f

    def J(cnt, cfg):
        inter = gts - cfg
        union = gts + cnt - cfg
        j = 1.0 - jnp.where(union > 0, inter / jnp.maximum(union, 1e-30), 0.0)
        return jnp.where(cnt > 0, j, 0.0)  # J(0) := 0 (the prepend in lovasz_grad)

    J_start = J(N_start, F_start)
    J_mid = J(N_start + f, F_start + f)
    J_end = J(N_end, F_end)
    c = n - f
    g_fg = jnp.where(f > 0, (J_mid - J_start) / jnp.maximum(f, 1e-30), 0.0)
    g_bg = jnp.where(c > 0, (J_end - J_mid) / jnp.maximum(c, 1e-30), 0.0)
    loss = jnp.dot(g_fg, Sf) + jnp.dot(g_bg, S - Sf)
    return loss, (emax, inv_w, jnp.stack([g_fg, g_bg]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hist_class_loss(bins, errors, fg, valid):
    """Histogram Lovász for one class over flat pixels (see block comment).

    Same contract as :func:`_class_loss`; d loss / d errors[p] is the
    per-bucket mean Jaccard step of p's (bucket, fg) group — the histogram
    analogue of the reference's detached ``Variable(grad)``
    (lovaszsoftmax.py:199)."""
    loss, _ = _hist_class_loss_impl(bins, errors, fg, valid)
    return loss


def _hist_class_loss_fwd(bins, errors, fg, valid):
    loss, (emax, inv_w, tables) = _hist_class_loss_impl(bins, errors, fg, valid)
    return loss, (errors, fg * valid, emax, inv_w, tables)


def _hist_class_loss_bwd(bins, res, ct):
    from ee_semantic_segmentation_tpu.ops.pallas.hist_kernel import table_lookup

    errors, fgv, emax, inv_w, tables = res
    w = table_lookup(
        errors[None], fgv[None], emax[None], inv_w[None], tables[None], bins=bins
    )[0]
    zeros = jnp.zeros_like(w)
    return w * ct, zeros, zeros


_hist_class_loss.defvjp(_hist_class_loss_fwd, _hist_class_loss_bwd)


def lovasz_softmax_flat(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    classes: str | tuple = "present",
    valid: jnp.ndarray | None = None,
    max_present: int | None = None,
    hist_bins: int | None = None,
) -> jnp.ndarray:
    """Multi-class Lovász-Softmax on flat pixels (lovaszsoftmax.py:172-200).

    Args:
      probas: (P, C) class scores (probabilities, or raw logits to match the
        reference's training usage).
      labels: (P,) int ground-truth labels.
      classes: 'present' | 'all' | explicit tuple/list of class ids.
      valid: (P,) bool — False marks void pixels (already folded in by
        :func:`lovasz_softmax`); None means all valid.
      max_present: with ``classes='present'``, sort/score only the K most
        frequent present classes instead of all C (the loss is sort-bound;
        the reference's Python ``continue`` over absent classes,
        lovaszsoftmax.py:186-187, means it never pays for them either —
        this restores that compute profile with static shapes).  Exact
        whenever the image has <= K present classes (typical VOC images
        have 2-5 of the 21); beyond K it covers the K largest-by-pixel-count
        classes only, so keep it None (exact) unless training is
        sort-bound.
      hist_bins: use the sort-free histogram Lovász with this many error
        buckets instead of the exact sorted form (see the block comment at
        :func:`_hist_class_loss`).  Approximate: loss error is bounded by
        (max_err - min_err) / hist_bins per class.  None (default) = exact.

    Returns: scalar loss.
    """
    P, C = probas.shape
    probas = jnp.asarray(probas)
    probas = probas.astype(jnp.promote_types(probas.dtype, jnp.float32))
    labels = jnp.asarray(labels)
    if valid is None:
        valid_f = jnp.ones((P,), probas.dtype)
    else:
        valid_f = jnp.asarray(valid, probas.dtype)

    compact = (
        classes == "present"
        and max_present is not None
        and 0 < max_present < C
    )
    if compact:
        # pixel count per class over valid pixels; class ids >= C (void
        # conventions like VOC's 21) fall off the end of the histogram.
        counts = jnp.zeros((C,), jnp.float32).at[labels].add(
            valid_f, mode="drop"
        )
        # most-frequent present classes first, absent classes last
        # (argsort is stable: ties and absents keep ascending class order)
        class_ids = jnp.argsort(jnp.where(counts > 0, -counts, 1.0))[
            : max_present
        ]
    elif isinstance(classes, str):
        class_ids = jnp.arange(C)
    else:
        class_ids = jnp.asarray(tuple(classes), jnp.int32)

    if hist_bins is not None:
        from ee_semantic_segmentation_tpu.ops.pallas.hist_kernel import hist_bins_ok

        if not hist_bins_ok(hist_bins):
            raise ValueError(
                f"hist_bins={hist_bins} must be 128 * a power of two"
            )

    def per_class(c):
        fg = ((labels == c) & (valid_f > 0)).astype(jnp.float32)
        pred = jnp.take(probas, c, axis=1)
        errors = jnp.where(valid_f > 0, jnp.abs(fg - pred), _NEG_BIG)
        if hist_bins is not None:
            return _hist_class_loss(hist_bins, errors, fg, valid_f), jnp.sum(fg) > 0
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
    max_present: int | None = None,
    hist_bins: int | None = None,
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
      max_present: sort only the K most frequent present classes per
        image/batch (see :func:`lovasz_softmax_flat`).
      hist_bins: opt into the sort-free histogram Lovász approximation with
        this many error buckets (see :func:`lovasz_softmax_flat`).
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
        f = functools.partial(
            lovasz_softmax_flat, classes=classes, max_present=max_present,
            hist_bins=hist_bins,
        )
        losses = jax.vmap(lambda p, l, v: f(p, l, valid=v))(flat_p, flat_l, valid)
        return jnp.mean(losses)
    return lovasz_softmax_flat(
        flat_p.reshape(-1, C), flat_l.reshape(-1), classes=classes,
        valid=valid.reshape(-1), max_present=max_present, hist_bins=hist_bins,
    )


# --------------------------------------------------------------- binary side
# The vendored file also ships the binary hinge losses and IoU helpers
# (lovaszsoftmax.py:34-148); same masked fixed-shape treatment.


@jax.custom_vjp
def _hinge_class_loss(errors: jnp.ndarray, fg: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Lovász hinge over flat pixels: ``dot(relu(errors_sorted), grad)``
    (lovaszsoftmax.py:96-112) with void slots masked instead of dropped.

    Like :func:`_class_loss`, the Lovász weight vector is a constant in the
    backward (the reference detaches it, lovaszsoftmax.py:111) and the relu
    contributes its usual gate; the unsort is a second sort, not a scatter.
    """
    loss, _ = _hinge_class_loss_fwd_impl(errors, fg, valid)
    return loss


def _hinge_class_loss_fwd_impl(errors, fg, valid):
    P = errors.shape[0]
    if 4 * P - 1 <= (1 << 24):  # same packed-f32 2-operand sort as _class_loss
        iota_f = jax.lax.broadcasted_iota(jnp.float32, (P, 1), 0)[:, 0]
        pay = iota_f * 4.0 + fg * 2.0 + valid
        neg_err, pay_s = _sort2(-errors, pay)
        pay_i = pay_s.astype(jnp.int32)
        # keep the saved permutation in f32 (exact: perm < 2^22 here): the
        # backward unsort then reuses the SAME f32-key sort kernel as the
        # forward instead of instantiating an int32-key variant — halves the
        # ~200 s/kernel Mosaic compile cost (tools/bench_sort_compile.py).
        perm = jax.lax.shift_right_logical(pay_i, jnp.int32(2)).astype(jnp.float32)
        fg_s = ((pay_i & 2) >> 1).astype(jnp.float32)
        valid_s = (pay_i & 1).astype(jnp.float32)
    else:
        packed = fg * 2.0 + valid
        iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
        neg_err, packed_s, perm = jax.lax.sort((-errors, packed, iota), num_keys=1)
        fg_s = (packed_s > 2.0).astype(jnp.float32)
        valid_s = (packed_s > 0.0).astype(jnp.float32)
    errors_sorted = -neg_err
    grad = lovasz_grad(fg_s, valid_s)
    hinged = jnp.maximum(errors_sorted, 0.0) * valid_s
    loss = jnp.dot(hinged, grad)
    relu_gate = (errors_sorted > 0).astype(jnp.float32)
    return loss, (perm, grad * relu_gate * valid_s)


def _hinge_class_loss_fwd(errors, fg, valid):
    return _hinge_class_loss_fwd_impl(errors, fg, valid)


_hinge_class_loss.defvjp(_hinge_class_loss_fwd, _class_loss_bwd)


def lovasz_hinge_flat(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Binary Lovász hinge on flat logits (lovaszsoftmax.py:96-112).

    logits: (P,) raw scores; labels: (P,) {0, 1}; valid: (P,) bool or None.
    """
    P = logits.shape[0]
    logits = jnp.asarray(logits, jnp.float32)
    valid_f = jnp.ones((P,), jnp.float32) if valid is None else jnp.asarray(valid, jnp.float32)
    fg = (jnp.asarray(labels) > 0).astype(jnp.float32) * valid_f
    signs = 2.0 * fg - 1.0
    errors = jnp.where(valid_f > 0, 1.0 - logits * signs, _NEG_BIG)
    return _hinge_class_loss(errors, fg, valid_f)


def lovasz_hinge(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    per_image: bool = True,
    ignore: int | None = None,
) -> jnp.ndarray:
    """Binary Lovász hinge loss (lovaszsoftmax.py:79-93), (N, H, W) layout.

    ``per_image=True`` (the reference default) averages per-image flat
    losses; void pixels (``labels == ignore``) are masked, not dropped.
    """
    N = logits.shape[0]
    flat_log = jnp.asarray(logits, jnp.float32).reshape(N, -1)
    flat_lab = jnp.asarray(labels).reshape(N, -1)
    valid = jnp.ones_like(flat_lab, bool) if ignore is None else (flat_lab != ignore)
    if per_image:
        losses = jax.vmap(lovasz_hinge_flat)(flat_log, flat_lab, valid)
        return jnp.mean(losses)
    return lovasz_hinge_flat(flat_log.reshape(-1), flat_lab.reshape(-1), valid.reshape(-1))


def flatten_binary_scores(scores, labels, ignore: int | None = None):
    """Flatten batch scores/labels for the binary losses
    (lovaszsoftmax.py:115-127).  The reference drops void pixels by boolean
    indexing; fixed shapes require masking, so this returns a third ``valid``
    array instead of shrinking."""
    scores = jnp.asarray(scores).reshape(-1)
    labels = jnp.asarray(labels).reshape(-1)
    valid = jnp.ones_like(labels, bool) if ignore is None else (labels != ignore)
    return scores, labels, valid


def binary_xloss(logits, labels, ignore: int | None = None) -> jnp.ndarray:
    """Numerically stable binary cross-entropy on logits
    (StableBCELoss, lovaszsoftmax.py:130-148): mean over valid pixels of
    ``max(x, 0) - x*y + log(1 + exp(-|x|))``."""
    x, y, valid = flatten_binary_scores(logits, labels, ignore)
    x = x.astype(jnp.float32)
    y = (y > 0).astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    valid_f = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(valid_f), 1.0)
    return jnp.sum(loss * valid_f) / denom


# ------------------------------------------------------------- IoU helpers
def iou_binary(preds, labels, EMPTY: float = 1.0, ignore: int | None = None,
               per_image: bool = True) -> float:
    """Foreground IoU percentage (lovaszsoftmax.py:34-53): preds/labels are
    {0, 1} maps; empty unions score ``EMPTY``; mean across images when
    ``per_image``."""
    preds = jnp.asarray(preds)
    labels = jnp.asarray(labels)
    if per_image:
        preds = preds.reshape(preds.shape[0], -1)
        labels = labels.reshape(labels.shape[0], -1)
    else:
        preds = preds.reshape(1, -1)
        labels = labels.reshape(1, -1)
    keep = jnp.ones_like(labels, bool) if ignore is None else (labels != ignore)
    inter = jnp.sum((labels == 1) & (preds == 1), axis=1)
    union = jnp.sum((labels == 1) | ((preds == 1) & keep), axis=1)
    per = jnp.where(union > 0, inter / jnp.maximum(union, 1), EMPTY)
    return 100.0 * float(jnp.mean(per))


def iou(preds, labels, C: int, EMPTY: float = 1.0, ignore: int | None = None,
        per_image: bool = False):
    """Per-class IoU percentages over the non-ignored classes
    (lovaszsoftmax.py:56-73).  Returns a numpy array of length
    ``C`` (or ``C - 1`` when ``ignore`` is one of the classes), matching the
    reference's ``100 * np.array(ious)``."""
    import numpy as np

    preds = jnp.asarray(preds)
    labels = jnp.asarray(labels)
    if per_image:
        preds = preds.reshape(preds.shape[0], -1)
        labels = labels.reshape(labels.shape[0], -1)
    else:
        preds = preds.reshape(1, -1)
        labels = labels.reshape(1, -1)
    keep = jnp.ones_like(labels, bool) if ignore is None else (labels != ignore)

    def one_class(c):
        inter = jnp.sum((labels == c) & (preds == c), axis=1)
        union = jnp.sum((labels == c) | ((preds == c) & keep), axis=1)
        return jnp.mean(jnp.where(union > 0, inter / jnp.maximum(union, 1), EMPTY))

    classes = [c for c in range(C) if ignore is None or c != ignore]
    vals = jax.vmap(one_class)(jnp.asarray(classes))
    return 100.0 * np.asarray(vals)
