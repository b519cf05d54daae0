"""Fused Pallas upsample+argmax eval head (VERDICT #6): weight-matrix
exactness, kernel-vs-jnp agreement, and end-to-end mIoU equality with the
standard fused evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
    _resize_matrix_np,
    upsample_argmax,
    upsample_argmax_reference,
)


@pytest.mark.parametrize("n_in,n_out", [(8, 32), (8, 13), (5, 17), (64, 512), (16, 16)])
def test_resize_matrix_matches_jax(n_in, n_out):
    m = _resize_matrix_np(n_in, n_out)
    ref = np.asarray(jax.image.resize(jnp.eye(n_in), (n_out, n_in), method="bilinear"))
    np.testing.assert_allclose(m, ref, atol=1e-6)


@pytest.mark.parametrize(
    "shape,out_hw",
    [((2, 8, 12, 5), (32, 48)), ((3, 4, 4, 21), (32, 32)), ((1, 16, 16, 3), (16, 16))],
)
def test_kernel_matches_reference(shape, out_hw):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    got = np.asarray(upsample_argmax(x, out_hw))
    want = np.asarray(upsample_argmax_reference(x, out_hw))
    np.testing.assert_array_equal(got, want)


def test_entropy_argmax_kernel_matches_jnp():
    """Fused upsample+softmax+entropy+argmax: labels exactly equal, entropy
    matches norm_entropy(softmax(resize(x))) to float tolerance."""
    from ee_semantic_segmentation_tpu.ops.gating import norm_entropy
    from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
        upsample_entropy_argmax,
    )

    x = jnp.asarray(np.random.RandomState(4).randn(3, 8, 12, 5).astype(np.float32) * 2)
    lab, ent = upsample_entropy_argmax(x, (32, 48))
    np.testing.assert_array_equal(
        np.asarray(lab), np.asarray(upsample_argmax_reference(x, (32, 48)))
    )
    up = jax.image.resize(x, (3, 32, 48, 5), method="bilinear")
    probs = jax.nn.softmax(up, axis=-1)
    want = jax.vmap(lambda p: norm_entropy(p, 5))(probs)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_entropy_evaluator_pallas_head_matches(tiny_model, tiny_state):
    """br_evaluator_entropy_fused(pallas_head=True) returns the same result
    dict as the XLA path."""
    from ee_semantic_segmentation_tpu.ee.batch_eval import br_evaluator_entropy_fused

    rng = np.random.RandomState(5)
    batches = [
        {
            "image": rng.rand(4, 32, 32, 3).astype(np.float32),
            "label": rng.randint(0, 5, (4, 32, 32)).astype(np.int32),
        }
        for _ in range(2)
    ]
    tau = 0.97
    a = br_evaluator_entropy_fused(tiny_model, tiny_state, 2, 5, list(batches), tau)
    b = br_evaluator_entropy_fused(
        tiny_model, tiny_state, 2, 5, list(batches), tau, pallas_head=True
    )
    assert a.keys() == b.keys()
    for k in a:
        # empty exit buckets give NaN mIoU (reference semantics) — NaN in
        # both paths counts as agreement
        assert a[k] == pytest.approx(b[k], rel=1e-6, nan_ok=True), k


def test_similarity_evaluator_pallas_head_matches(tiny_model, tiny_state):
    """br_evaluator_similarity_fused(pallas_head=True) matches the XLA path
    (label maps identical -> identical gates and counts)."""
    from ee_semantic_segmentation_tpu.ee.batch_eval import br_evaluator_similarity_fused

    rng = np.random.RandomState(6)
    batches = [
        {
            "image": rng.rand(4, 32, 32, 3).astype(np.float32),
            "label": rng.randint(0, 5, (4, 32, 32)).astype(np.int32),
        }
    ]
    a = br_evaluator_similarity_fused(
        tiny_model, tiny_state, 2, 5, list(batches), "mse", 10.0
    )
    b = br_evaluator_similarity_fused(
        tiny_model, tiny_state, 2, 5, list(batches), "mse", 10.0, pallas_head=True
    )
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-6, nan_ok=True), k


def test_pallas_miou_step_matches_fused(tiny_model, tiny_state):
    """The Pallas-head evaluator produces the same (E, 3, C) confusion counts
    (hence digit-identical mIoU) as the standard fused program."""
    from ee_semantic_segmentation_tpu.ee.batch_eval import (
        make_fused_miou_step_fn,
        make_pallas_miou_step_fn,
    )

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (4, 32, 32)).astype(np.int32))

    std = make_fused_miou_step_fn(tiny_model, 5)
    pal = make_pallas_miou_step_fn(tiny_model, 5)
    a = np.asarray(std(tiny_state.params, tiny_state.batch_stats, images, labels, 3))
    b = np.asarray(pal(tiny_state.params, tiny_state.batch_stats, images, labels, 3))
    # identical argmaxes -> identical integer confusion counts (float-assoc
    # differences in the upsample can only flip exact ties, absent in
    # continuous random logits)
    np.testing.assert_array_equal(a, b)


def test_confusion_kernel_matches_xla_counts():
    """upsample_argmax_confusion == confusion_update(upsample_argmax(...))
    bit-for-bit, including void labels (>= C -> FP only) and the count
    mask skipping padded rows (VERDICT r02 #8)."""
    from ee_semantic_segmentation_tpu.ops.metrics import confusion_counts
    from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
        upsample_argmax_confusion,
    )

    rng = np.random.RandomState(7)
    C = 5
    x = jnp.asarray(rng.randn(4, 8, 12, C).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C + 1, (4, 32, 48)).astype(np.int32))

    for count in (4, 2):
        got = np.asarray(upsample_argmax_confusion(x, labels, count, (32, 48)))
        maps = upsample_argmax(x, (32, 48))
        tp, fp, fn = confusion_counts(maps, labels, C)
        mask = (np.arange(4) < count).astype(np.float32)[:, None]
        want = np.stack([
            (np.asarray(tp) * mask).sum(0),
            (np.asarray(fp) * mask).sum(0),
            (np.asarray(fn) * mask).sum(0),
        ])
        np.testing.assert_array_equal(got, want)
        # sanity: void pixels exist and contribute FP but never TP/FN
        assert got.shape == (3, C)


def test_confusion_tiled_xla_matches_materializing_path():
    """The row-tiled plain-XLA fallback (used above the Pallas pixel
    envelope) matches the materializing resize path exactly on tie-free
    inputs, including void labels and the count mask."""
    import importlib

    # NOTE: `import ...pallas.upsample_argmax as U` resolves the FUNCTION
    # re-exported by ops/pallas/__init__ (it shadows the submodule name)
    U = importlib.import_module(
        "ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax")
    from ee_semantic_segmentation_tpu.ops.metrics import confusion_counts

    rng = np.random.RandomState(11)
    C = 6
    x = jnp.asarray(rng.randn(3, 16, 8, C).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C + 1, (3, 64, 32)).astype(np.int32))

    for count in (3, 1):
        got = U._confusion_tiled_xla(x, labels, count, (64, 32))
        assert got is not None
        maps = upsample_argmax(x, (64, 32))
        tp, fp, fn = confusion_counts(maps, labels, C)
        mask = (np.arange(3) < count).astype(np.float32)[:, None]
        want = np.stack([
            (np.asarray(tp) * mask).sum(0),
            (np.asarray(fp) * mask).sum(0),
            (np.asarray(fn) * mask).sum(0),
        ])
        np.testing.assert_array_equal(np.asarray(got), want)


def test_entropy_tiled_xla_matches_materializing_path():
    """The row-tiled entropy fallback == the materializing resize path:
    identical label maps and per-image normalized entropies."""
    import importlib

    U = importlib.import_module(
        "ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax")
    from ee_semantic_segmentation_tpu.ops.gating import norm_entropy

    rng = np.random.RandomState(12)
    C = 5
    x = jnp.asarray(rng.randn(2, 16, 8, C).astype(np.float32))
    maps, ent = U._entropy_tiled_xla(x, (64, 32))

    up = jax.image.resize(x, (2, 64, 32, C), method="bilinear")
    want_maps = jnp.argmax(up, axis=-1).astype(jnp.int32)
    probs = jax.nn.softmax(up, axis=-1)
    want_ent = jax.vmap(lambda p: norm_entropy(p, C))(probs)
    np.testing.assert_array_equal(np.asarray(maps), np.asarray(want_maps))
    np.testing.assert_allclose(np.asarray(ent), np.asarray(want_ent),
                               rtol=1e-5, atol=1e-7)


def test_argmax_tiled_xla_matches_materializing_path():
    """The maps-only row-tiled fallback == the materializing resize path."""
    import importlib

    U = importlib.import_module(
        "ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax")

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(2, 16, 8, 5).astype(np.float32))
    got = U._argmax_tiled_xla(x, (64, 32))
    assert got is not None
    want = upsample_argmax_reference(x, (64, 32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
