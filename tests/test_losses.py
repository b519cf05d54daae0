"""Golden-parity tests: JAX losses vs the reference torch implementation.

Inputs come from tests/fixtures.py (NCHW, reference layout) and are
transposed to our channels-last layout; expected values come from
tests/golden/reference_values.json (generated once by tools/gen_golden.py).
"""

import numpy as np
import pytest

import fixtures as FX

from ee_semantic_segmentation_tpu.ops import losses as L
from ee_semantic_segmentation_tpu.ops import branchy as B
from ee_semantic_segmentation_tpu.ops import xentropy as X
from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_softmax

RTOL = 1e-5
ATOL = 1e-5


def hand_nhwc():
    pred = FX.nchw_to_nhwc(FX.HAND_PRED)  # (2, 4, 6, 4)
    true = FX.HAND_TRUE[:, 0]  # (2, 4, 6)
    return pred, true


def assert_close(actual, expected, rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(np.asarray(actual), expected, rtol=rtol, atol=atol)


# ---------------------------------------------------------------- hand scene
@pytest.mark.parametrize(
    "key,make",
    [
        ("hand/jaccard_mean", lambda: L.JaccardLoss()),
        ("hand/jaccard_sum", lambda: L.JaccardLoss(reduction="sum")),
        ("hand/jaccard_index_mean", lambda: L.JaccardLoss(index=True)),
        ("hand/dice_mean", lambda: L.DiceLoss()),
        ("hand/dice_index_mean", lambda: L.DiceLoss(index=True)),
        ("hand/tversky_mean", lambda: L.TverskyLoss()),
        ("hand/ftversky_mean", lambda: L.FocalTverskyLoss(gamma=4 / 3)),
        ("hand/focal_mean", lambda: L.FocalLoss()),
    ],
)
def test_hand_losses(golden, key, make):
    pred, true = hand_nhwc()
    assert_close(make()(pred, true), golden[key])


def test_hand_lovasz(golden):
    pred, true = hand_nhwc()
    assert_close(lovasz_softmax(pred, true, classes="present"), golden["hand/lovasz_present"], rtol=1e-4)
    assert_close(lovasz_softmax(pred, true, classes="all"), golden["hand/lovasz_all"], rtol=1e-4)
    assert_close(
        lovasz_softmax(pred, true, classes="present", per_image=True),
        golden["hand/lovasz_per_image"],
        rtol=1e-4,
    )


# ------------------------------------------------------- random void fixture
def rand_nhwc():
    logits, labels = FX.random_logits(seed=0)
    return FX.nchw_to_nhwc(logits), labels


def test_rand_lovasz_ignore(golden):
    pred, true = rand_nhwc()
    assert_close(
        lovasz_softmax(pred, true, classes="present", ignore=21),
        golden["rand/lovasz_present_ignore"], rtol=1e-4,
    )
    assert_close(
        lovasz_softmax(pred, true, classes="all", ignore=21),
        golden["rand/lovasz_all_ignore"], rtol=1e-4,
    )
    assert_close(
        lovasz_softmax(pred, true, classes="present", per_image=True, ignore=21),
        golden["rand/lovasz_present_per_image_ignore"], rtol=1e-4,
    )


def test_rand_lovasz_absent_classes(golden):
    logits, labels = FX.random_logits_absent()
    pred = FX.nchw_to_nhwc(logits)
    assert_close(
        lovasz_softmax(pred, labels, classes="present", ignore=6),
        golden["absent/lovasz_present_ignore"], rtol=1e-4,
    )
    assert_close(
        lovasz_softmax(pred, labels, classes="all", ignore=6),
        golden["absent/lovasz_all_ignore"], rtol=1e-4,
    )
    assert_close(
        lovasz_softmax(pred, labels, classes=(0, 1, 2), ignore=6),
        golden["absent/lovasz_list"], rtol=1e-4,
    )


def test_rand_cross_entropy(golden):
    pred, true = rand_nhwc()
    assert_close(X.cross_entropy(pred, true, ignore_index=21), golden["rand/ce_ignore_mean"])
    assert_close(
        X.cross_entropy(pred, true, ignore_index=21, reduction="sum"),
        golden["rand/ce_ignore_sum"], rtol=1e-4,
    )


def test_rand_region_losses(golden):
    pred, true = rand_nhwc()
    assert_close(L.JaccardLoss()(pred, true), golden["rand/jaccard_mean"])
    assert_close(L.DiceLoss()(pred, true), golden["rand/dice_mean"])


# ----------------------------------------------------------- multi-exit
def test_branchy_lovasz(golden):
    logits, labels = FX.random_logits(seed=3, exits=4, n=2, c=21, h=8, w=9)
    pred = FX.nchw_to_nhwc(logits)
    bl = B.LovaszSoftmax(classes="present", ignore=21, n_branches=3)
    assert_close(bl(pred, labels), golden["exit/br_lovasz_sum"], rtol=1e-4)
    bl2 = B.LovaszSoftmax(classes="present", ignore=21, n_branches=3, prev_out=True)
    assert_close(bl2(pred, labels), golden["exit/br_lovasz_prev_out"], rtol=1e-4)


def test_branchy_xent(golden):
    logits, labels = FX.random_logits(seed=3, exits=4, n=2, c=21, h=8, w=9)
    pred = FX.nchw_to_nhwc(logits)
    bx = X.BrXEntropyLoss(ignore_index=21, b_reduction="sum", n_exits=4)
    assert_close(bx(pred, labels), golden["exit/br_xent_sum"], rtol=1e-4)
    bx2 = X.BrXEntropyLoss(
        ignore_index=21, b_reduction="mean", n_exits=4, weights=[0.25, 0.5, 0.75, 1.0]
    )
    assert_close(bx2(pred, labels), golden["exit/br_xent_weighted_mean"], rtol=1e-4)


@pytest.mark.parametrize(
    "key,make",
    [
        ("exit/br_dice", lambda: B.DiceLoss(n_branches=2)),
        ("exit/br_jaccard", lambda: B.JaccardLoss(n_branches=2)),
        ("exit/br_tversky", lambda: B.TverskyLoss(alpha=0.7, beta=0.3, n_branches=2)),
        ("exit/br_ftversky", lambda: B.FocalTverskyLoss(alpha=0.7, beta=0.3, gamma=4 / 3, n_branches=2)),
        ("exit/br_focal", lambda: B.FocalLoss(n_branches=2)),
    ],
)
def test_branchy_region_losses(golden, key, make):
    logits, labels = FX.random_logits_novoid(seed=4, exits=3, n=2, c=5, h=6, w=7)
    pred = FX.nchw_to_nhwc(logits)
    assert_close(make()(pred, labels), golden[key], rtol=1e-4)


def test_update_n_changes_exit_count():
    logits, labels = FX.random_logits_novoid(seed=4, exits=3, n=2, c=5, h=6, w=7)
    pred = FX.nchw_to_nhwc(logits)
    loss = B.DiceLoss(n_branches=2)
    three = loss(pred, labels)
    loss.update_n(1)
    two = loss(pred, labels)
    assert float(two) < float(three)  # fewer exits -> smaller summed-weight loss


def test_lovasz_grad_matches_reference_semantics():
    """lovasz_grad on an unmasked vector must equal the reference formula."""
    from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_grad

    gt = np.array([1.0, 0.0, 1.0, 1.0, 0.0], np.float32)
    g = np.asarray(lovasz_grad(gt))
    gts = gt.sum()
    inter = gts - np.cumsum(gt)
    union = gts + np.cumsum(1 - gt)
    jac = 1.0 - inter / union
    expected = np.concatenate([[jac[0]], np.diff(jac)])
    np.testing.assert_allclose(g, expected, rtol=1e-6)


def test_branchy_loss_wrapper_modes(golden):
    """funcs.py:40-68 Branchy_loss: batch-first stack, weight masks."""
    logits, labels = FX.random_logits_novoid(seed=9, n=2, c=4, h=5, w=6)
    stack = np.stack([logits + 0.1 * k for k in range(3)], axis=1)  # (N,E,C,H,W)
    stack_nhwc = FX.nchw_to_nhwc(stack)  # (N, E, H, W, C)
    wrapped = B.Branchy_loss(L.FocalLoss(reduction="mean"))
    for mode in ("equal", "min_first", "max_first"):
        wrapped.weight = mode
        got = np.asarray(wrapped(stack_nhwc, labels))
        np.testing.assert_allclose(got, golden[f"wrap/branchy_loss_{mode}"], rtol=1e-4)


def test_lovasz_custom_vjp_gradient():
    """The custom VJP (sort-based unsort backward) must match plain autodiff
    through the sort; checked against an inline reference in float32 and for
    flow through the vmapped multi-exit wrapper."""
    import jax
    import jax.numpy as jnp

    def plain_flat(probas, labels, valid, C):
        losses = []
        present = []
        for c in range(C):
            fg = ((labels == c) & valid).astype(jnp.float32)
            pred = probas[:, c]
            errors = jnp.where(valid, jnp.abs(fg - pred), -1e30)
            packed = fg * 2.0 + valid.astype(jnp.float32)
            neg_err, packed_s = jax.lax.sort((-errors, packed), num_keys=1)
            es = -neg_err
            fg_s = (packed_s > 2.0).astype(jnp.float32)
            vs = (packed_s > 0.0).astype(jnp.float32)
            gts = jnp.sum(fg_s)
            inter = gts - jnp.cumsum(fg_s)
            union = gts + jnp.cumsum(vs - fg_s)
            jac = 1.0 - jnp.where(union > 0, inter / union, 0.0)
            delta = jax.lax.stop_gradient(jnp.diff(jac, prepend=0.0) * vs)
            losses.append(jnp.dot(jnp.where(vs > 0, es, 0.0), delta))
            present.append(jnp.sum(fg) > 0)
        losses = jnp.stack(losses)
        present = jnp.stack(present)
        n = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(present, losses, 0.0)) / n

    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(120, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (120,)))
    valid = jnp.asarray(rng.rand(120) > 0.15)

    from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_softmax_flat

    g_ref = jax.grad(lambda x: plain_flat(x, labels, valid, 4))(logits)
    g_ours = jax.grad(lambda x: lovasz_softmax_flat(x, labels, valid=valid))(logits)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), rtol=1e-5, atol=1e-6)

    # multi-exit wrapper: gradient finite and nonzero
    stacked = jnp.asarray(rng.randn(2, 1, 6, 7, 4).astype(np.float32))
    lab2 = jnp.asarray(rng.randint(0, 4, (1, 6, 7)))
    bl = B.LovaszSoftmax(classes="present", ignore=None, n_branches=1)
    g = jax.grad(lambda x: bl(x, lab2))(stacked)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_lovasz_all_void_is_zero():
    pred = np.random.RandomState(0).randn(1, 4, 4, 3).astype(np.float32)
    labels = np.full((1, 4, 4), 3, np.int64)  # every pixel void
    assert float(lovasz_softmax(pred, labels, classes="present", ignore=3)) == 0.0


# ------------------------------------------------- binary hinge / IoU surface
def test_lovasz_hinge_golden(golden):
    from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_hinge

    logits, labels = FX.binary_logits()
    assert_close(
        lovasz_hinge(logits, labels, per_image=True, ignore=2),
        golden["bin/lovasz_hinge_per_image"], rtol=1e-4,
    )
    assert_close(
        lovasz_hinge(logits, labels, per_image=False, ignore=2),
        golden["bin/lovasz_hinge_flat"], rtol=1e-4,
    )
    assert_close(
        lovasz_hinge(logits, np.clip(labels, 0, 1), per_image=False),
        golden["bin/lovasz_hinge_no_ignore"], rtol=1e-4,
    )


def test_binary_xloss_golden(golden):
    from ee_semantic_segmentation_tpu.ops.lovasz import binary_xloss

    logits, labels = FX.binary_logits()
    assert_close(binary_xloss(logits, labels, ignore=2), golden["bin/binary_xloss"], rtol=1e-5)


def test_iou_helpers_golden(golden):
    from ee_semantic_segmentation_tpu.ops.lovasz import iou, iou_binary

    preds, labels = FX.label_maps()
    bin_preds = (preds == 1).astype(np.int64)
    bin_labels = np.where(labels == 5, 5, (labels == 1).astype(np.int64))
    assert_close(
        iou_binary(bin_preds, bin_labels, ignore=5, per_image=True),
        golden["bin/iou_binary_per_image"], rtol=1e-6,
    )
    assert_close(
        iou(preds, labels, C=5, ignore=5, per_image=False),
        golden["bin/iou_per_class"], rtol=1e-5,
    )
    assert_close(
        iou(preds, labels, C=5, ignore=5, per_image=True),
        golden["bin/iou_per_class_per_image"], rtol=1e-5,
    )


def test_lovasz_hinge_gradient_flows():
    """Hinge custom VJP: gradient is finite, zero on void slots, and matches
    finite differences on a tiny case."""
    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_hinge

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 4, 5).astype(np.float32))
    labels = rng.randint(0, 2, (2, 4, 5)).astype(np.int64)
    labels[0, 0, :2] = 9  # void
    fn = lambda x: lovasz_hinge(x, labels, per_image=False, ignore=9)
    g = jax.grad(fn)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.asarray(g)[0, 0, :2] == 0.0)
    # directional finite difference
    d = jnp.asarray(rng.randn(*logits.shape).astype(np.float32))
    eps = 1e-3
    fd = (fn(logits + eps * d) - fn(logits - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, d)), float(fd), rtol=2e-2, atol=1e-3)


def test_lovasz_hinge_all_void_is_zero():
    from ee_semantic_segmentation_tpu.ops.lovasz import lovasz_hinge

    logits = np.random.RandomState(1).randn(1, 3, 3).astype(np.float32)
    labels = np.full((1, 3, 3), 7, np.int64)
    assert float(lovasz_hinge(logits, labels, per_image=False, ignore=7)) == 0.0


# ------------------------------------------------- present-class compaction
def test_lovasz_max_present_exact_when_few_classes():
    """max_present=K sorts only the K most frequent present classes; when an
    image has <= K present classes the loss AND gradient equal the exact
    (all-C) path bit-for-bit up to reduction association."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    n, c, h, w = 2, 21, 8, 9
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    # only 4 distinct classes present (+ void=21)
    labels = np.asarray([1, 5, 7, 16])[rng.randint(0, 4, (n, h, w))]
    labels[rng.rand(n, h, w) < 0.1] = 21
    labels = jnp.asarray(labels.astype(np.int32))

    for per_image in (False, True):
        exact = lambda x: lovasz_softmax(
            x, labels, classes="present", per_image=per_image, ignore=21)
        compact = lambda x: lovasz_softmax(
            x, labels, classes="present", per_image=per_image, ignore=21,
            max_present=8)
        np.testing.assert_allclose(
            float(compact(logits)), float(exact(logits)), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.grad(lambda x: compact(x))(logits)),
            np.asarray(jax.grad(lambda x: exact(x))(logits)),
            rtol=1e-5, atol=1e-7)


def test_lovasz_max_present_topk_truncation():
    """With more present classes than K, the K most frequent are scored —
    K=1 on a two-class scene equals the single-class list form."""
    import jax.numpy as jnp

    rng = np.random.RandomState(6)
    n, c, h, w = 1, 6, 8, 8
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    labels = np.full((n, h, w), 2, np.int32)
    labels[:, :2, :] = 4  # class 4 on 25% of pixels, class 2 on 75%
    labels = jnp.asarray(labels)

    got = lovasz_softmax(logits, labels, classes="present", max_present=1)
    want = lovasz_softmax(logits, labels, classes=(2,))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_branchy_lovasz_max_present_matches_exact(golden):
    logits, labels = FX.random_logits(seed=3, exits=4, n=2, c=21, h=8, w=9)
    pred = FX.nchw_to_nhwc(logits)
    # restrict to 5 present classes (+ void) so K=8 covers them all
    labels = np.asarray(labels)
    labels = np.where(labels == 21, 21, np.asarray([0, 2, 9, 13, 20])[labels % 5])
    bl = B.LovaszSoftmax(classes="present", ignore=21, n_branches=3,
                         max_present=8)
    ref = B.LovaszSoftmax(classes="present", ignore=21, n_branches=3)
    np.testing.assert_allclose(
        float(bl(pred, labels)), float(ref(pred, labels)), rtol=1e-5)


def test_branchy_lovasz_exact_fallback_dispatch():
    """-X/exact_fallback: the compacted multi-exit loss dispatches (one
    lax.cond above all vmaps) to the all-class path whenever the batch
    exceeds K present classes — value AND grad match the exact loss in
    both regimes, so -K -X is exact always."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    e, n, c, h, w = 3, 2, 12, 8, 9
    logits = jnp.asarray(rng.randn(e, n, h, w, c).astype(np.float32))

    few = np.asarray([1, 3, 7])[rng.randint(0, 3, (n, h, w))]
    many = rng.randint(0, c, (n, h, w))  # ~12 present classes > K=4
    mixed = np.stack([few[0], many[0]])  # one sparse image, one dense
    for per_image in (False, True):
        auto = B.LovaszSoftmax(classes="present", ignore=c, n_branches=e - 1,
                               per_image=per_image, max_present=4,
                               exact_fallback=True)
        exact = B.LovaszSoftmax(classes="present", ignore=c, n_branches=e - 1,
                                per_image=per_image)
        for labels in (few, many, mixed):
            labels = jnp.asarray(labels.astype(np.int32))
            got, ggrad = jax.value_and_grad(lambda x: auto(x, labels))(logits)
            want, wgrad = jax.value_and_grad(lambda x: exact(x, labels))(logits)
            np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(ggrad), np.asarray(wgrad),
                                       rtol=1e-4, atol=1e-7)


def test_exact_compaction_flag_reaches_loss():
    from ee_semantic_segmentation_tpu.cli.main_bradeepv3 import build_parser

    args = build_parser().parse_args(
        ["-K", "8", "-X"])
    assert args.exact_compaction is True
    bl = B.LovaszSoftmax(classes="present", n_branches=2,
                         max_present=args.max_present,
                         exact_fallback=args.exact_compaction)
    assert bl.exact_fallback is True and bl.max_present == 8
