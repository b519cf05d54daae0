"""Mesh-sharded EVAL paths (VERDICT r03 #2): the fused mIoU step, the fused
gated br evaluators, and the masked gated engine must produce bit-identical
counts / exit indices on an 8-virtual-device 'data' mesh vs single device.

All summed quantities are integer-valued (TP/FP/FN pixel counts, exit
histograms), exact in f32 at these magnitudes, so "bit-identical" is the
right bar — any drift means rows were routed or masked differently.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def batch():
    r = np.random.RandomState(3)
    images = r.rand(8, 32, 32, 3).astype(np.float32)
    labels = r.randint(0, 5, (8, 32, 32)).astype(np.int32)
    return images, labels


def test_fused_miou_step_mesh_matches_single(tiny_model, tiny_state, batch):
    from ee_semantic_segmentation_tpu.ee.batch_eval import make_fused_miou_step_fn

    images, labels = batch
    mesh = make_mesh()
    single = make_fused_miou_step_fn(tiny_model, 5)
    sharded = make_fused_miou_step_fn(tiny_model, 5, mesh=mesh)
    args = (tiny_state.params, tiny_state.batch_stats,
            jnp.asarray(images), jnp.asarray(labels))
    a = np.asarray(single(*args, 8))
    b = np.asarray(sharded(*args, 8))
    np.testing.assert_array_equal(a, b)
    # padded final batch: count masking must agree through the mesh path too
    a = np.asarray(single(*args, 5))
    b = np.asarray(sharded(*args, 5))
    np.testing.assert_array_equal(a, b)


def test_pallas_miou_step_mesh_matches_single(tiny_model, tiny_state, batch):
    from ee_semantic_segmentation_tpu.ee.batch_eval import make_pallas_miou_step_fn

    images, labels = batch
    mesh = make_mesh()
    single = make_pallas_miou_step_fn(tiny_model, 5)
    sharded = make_pallas_miou_step_fn(tiny_model, 5, mesh=mesh)
    args = (tiny_state.params, tiny_state.batch_stats,
            jnp.asarray(images), jnp.asarray(labels))
    a = np.asarray(single(*args, 8))
    b = np.asarray(sharded(*args, 8))
    np.testing.assert_array_equal(a, b)
    a = np.asarray(single(*args, 6))
    b = np.asarray(sharded(*args, 6))
    np.testing.assert_array_equal(a, b)


def _loader(images, labels, bs):
    for i in range(0, len(images), bs):
        yield {"image": images[i : i + bs], "label": labels[i : i + bs]}


def _assert_res_equal(a, b):
    assert a.keys() == b.keys()
    for k in a:
        # NaN-tolerant exact equality (empty classes yield NaN mIoU)
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_br_entropy_fused_mesh_matches_single(tiny_model, tiny_state, batch):
    from ee_semantic_segmentation_tpu.ee.batch_eval import br_evaluator_entropy_fused

    images, labels = batch
    mesh = make_mesh()
    kw = dict(tau=0.5, metric="ent", size=1, skip=0)
    a = br_evaluator_entropy_fused(
        tiny_model, tiny_state, 2, 5, _loader(images, labels, 8), **kw)
    b = br_evaluator_entropy_fused(
        tiny_model, tiny_state, 2, 5, _loader(images, labels, 8), mesh=mesh, **kw)
    _assert_res_equal(a, b)


def test_br_similarity_fused_mesh_matches_single(tiny_model, tiny_state, batch):
    from ee_semantic_segmentation_tpu.ee.batch_eval import br_evaluator_similarity_fused

    images, labels = batch
    mesh = make_mesh()
    a = br_evaluator_similarity_fused(
        tiny_model, tiny_state, 2, 5, _loader(images, labels, 8), "mse", 0.5)
    b = br_evaluator_similarity_fused(
        tiny_model, tiny_state, 2, 5, _loader(images, labels, 8), "mse", 0.5,
        mesh=mesh)
    _assert_res_equal(a, b)


def test_masked_gated_apply_mesh_matches_single(tiny_model, tiny_state, batch):
    from ee_semantic_segmentation_tpu.ee.masked import make_masked_gated_apply

    images, _ = batch
    mesh = make_mesh()
    variables = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    kw = dict(tau=0.5, n_classes=5, skip=0)
    single = make_masked_gated_apply(tiny_model, variables, **kw)
    sharded = make_masked_gated_apply(tiny_model, variables, mesh=mesh, **kw)
    la, ea = single(jnp.asarray(images))
    lb, eb = sharded(jnp.asarray(images))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
    # uneven batch (5 rows on an 8-device mesh) falls back, stays correct
    la, ea = single(jnp.asarray(images[:5]))
    lb, eb = sharded(jnp.asarray(images[:5]))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))


def test_masked_gated_scan_mesh_matches_single(tiny_model, tiny_state, batch):
    from ee_semantic_segmentation_tpu.ee.masked import make_masked_gated_scan

    images, _ = batch
    mesh = make_mesh()
    variables = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    xs = jnp.asarray(images).reshape(1, 8, 32, 32, 3)
    single = make_masked_gated_scan(tiny_model, variables, tau=0.5, n_classes=5)
    sharded = make_masked_gated_scan(
        tiny_model, variables, mesh=mesh, tau=0.5, n_classes=5)
    la, ea = single(xs)
    lb, eb = sharded(xs)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
