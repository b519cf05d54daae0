"""Golden-parity tests for metrics (mIoU, img_mIoU, PRF, accuracy)."""

import numpy as np
import pytest

import fixtures as FX

from ee_semantic_segmentation_tpu.ops import metrics as M


def assert_close(actual, expected, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(np.asarray(actual), expected, rtol=rtol, atol=atol)


def hand_nhwc():
    return FX.nchw_to_nhwc(FX.HAND_PRED), FX.HAND_TRUE[:, 0]


def test_miou_hand(golden):
    pred, true = hand_nhwc()
    ev = M.mIoU(n_classes=4)
    ev(pred, true)
    assert_close(ev.compute(), golden["hand/mIoU"])


def test_miou_rand(golden):
    logits, labels = FX.random_logits(seed=0)
    ev = M.mIoU(n_classes=21)
    ev(FX.nchw_to_nhwc(logits), labels)
    assert_close(ev.compute(), golden["rand/mIoU"], rtol=1e-4)


def test_miou_streaming_equals_one_shot():
    logits, labels = FX.random_logits(seed=11, n=6, c=21, h=8, w=9)
    pred = FX.nchw_to_nhwc(logits)
    one = M.mIoU(21)
    one(pred, labels)
    stream = M.mIoU(21)
    for i in range(6):
        stream(pred[i : i + 1], labels[i : i + 1])
    assert_close(stream.compute(), one.compute())


def test_img_miou_hand(golden):
    pred, true = hand_nhwc()
    ev = M.img_mIoU(num_classes=5)
    for i in range(pred.shape[0]):
        ev(pred[i : i + 1], true[i : i + 1])
    assert_close(ev.compute(), golden["hand/img_mIoU"])


def test_prf_metrics(golden):
    pred, true = hand_nhwc()
    true = true.copy()
    true[1, 3, 5] = 10  # out-of-range label like the reference fixture
    assert_close(M.Recall()(pred, true), golden["hand/recall_macro"])
    assert_close(M.Precision()(pred, true), golden["hand/precision_macro"])
    assert_close(M.F_beta()(pred, true), golden["hand/f1_macro"])
    assert_close(M.Recall(avg="micro")(pred, true), golden["hand/recall_micro"])
    assert_close(M.Precision(avg="micro")(pred, true), golden["hand/precision_micro"])
    assert_close(M.F_beta(avg="micro")(pred, true), golden["hand/f1_micro"])
    assert_close(M.Accuracy()(pred, true), golden["hand/accuracy"])


def test_void_pixels_count_as_fp():
    """A void-labelled pixel must contribute an FP for the predicted class
    (the reference's crop idiom, seg_metrics.py:21-27)."""
    logits = np.zeros((1, 1, 2, 3), np.float32)
    logits[0, 0, :, 2] = 5.0  # both pixels predicted class 2
    labels = np.array([[[2, 3]]])  # second pixel void (C=3)
    tp, fp, fn = M.confusion_counts(logits, labels, num_classes=3)
    assert float(tp[0, 2]) == 1.0
    assert float(fp[0, 2]) == 1.0
    assert float(fn.sum()) == 0.0


def test_miou_empty_class_policies():
    logits = np.zeros((1, 1, 2, 3), np.float32)
    logits[0, 0, :, 0] = 5.0
    labels = np.zeros((1, 1, 2), np.int64)
    for policy, expect in [("nan", np.nan), ("one", 1.0), ("skip", 1.0)]:
        ev = M.mIoU(3, empty_class=policy)
        ev(logits, labels)
        got = ev.compute()
        if np.isnan(expect):
            assert np.isnan(got)
        else:
            assert got == pytest.approx(expect)


def test_label_map_input():
    """confusion_counts accepts already-argmaxed label maps (used by the
    sequential EE engine where exits produce label maps, ee_dnn_op.py:20-38)."""
    pred_map = np.array([[[0, 1], [2, 2]]])
    labels = np.array([[[0, 1], [2, 1]]])
    tp, fp, fn = M.confusion_counts(pred_map, labels, num_classes=3)
    assert float(tp.sum()) == 3.0
    assert float(fp[0, 2]) == 1.0
    assert float(fn[0, 1]) == 1.0
