"""Tests for the funcs.py-equivalent generic evaluators + full-model weight
import (tree-level)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_accumulator():
    from ee_semantic_segmentation_tpu.ee.generic_eval import Accumulator

    a = Accumulator(3)
    a.add(1, 2, 3)
    a.add(1, 0, 1)
    assert a[0] == 2 and a[1] == 2 and a[2] == 4
    a.reset()
    assert a[0] == 0


def test_repeat_tensor():
    from ee_semantic_segmentation_tpu.ee.generic_eval import repeat_tensor

    x = np.arange(12).reshape(2, 2, 3)
    out = np.asarray(repeat_tensor(x, 4))
    assert out.shape == (2, 4, 2, 3)
    np.testing.assert_array_equal(out[:, 0], x)
    np.testing.assert_array_equal(out[:, 3], x)


class _Batches:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def test_eval_results_and_branches():
    from ee_semantic_segmentation_tpu.ee.generic_eval import eval_branches, eval_results

    rng = np.random.RandomState(0)
    batches = [
        {"image": rng.rand(2, 4, 4, 3).astype(np.float32),
         "label": rng.randint(0, 3, (2, 4, 4)), "count": 2}
        for _ in range(3)
    ]

    def net_single(x):
        return jnp.zeros(x.shape[:3] + (3,))

    def metric(pred, target):
        return jnp.mean((jnp.argmax(pred, -1) == target).astype(jnp.float32))

    acc = eval_results(count_one=True)(net_single, _Batches(batches), metric)
    # all-zero logits -> argmax 0; labels uniform over 3 classes
    assert 0.1 < acc < 0.6

    def net_multi(x):
        return jnp.zeros((3,) + x.shape[:3] + (3,))

    res = eval_branches(2)(net_multi, _Batches(batches), metric)
    assert set(res) == {"b1", "b2", "out"}
    assert res["b1"] == pytest.approx(res["out"])


def test_full_model_state_dict_conversion(tiny_model):
    """Synthesize a full torchvision-style backbone state dict for ResNet-50
    and merge it into the model's variable tree (shape-checked overlay)."""
    from ee_semantic_segmentation_tpu.models import import_torch as IT
    from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs

    rng = np.random.RandomState(0)
    sd = {"backbone.conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
    for s in ("weight", "bias", "running_mean", "running_var"):
        sd[f"backbone.bn1.{s}"] = rng.rand(64).astype(np.float32)
    spec = resnet_block_specs(50)
    import re

    for blk in spec.blocks:
        stage, idx = re.match(r"layer(\d+)\.(\d+)", blk.name).groups()
        tp = f"backbone.layer{stage}.{idx}"
        sd[f"{tp}.conv1.weight"] = rng.randn(blk.width, blk.cin, 1, 1).astype(np.float32)
        sd[f"{tp}.conv2.weight"] = rng.randn(blk.width, blk.width, 3, 3).astype(np.float32)
        sd[f"{tp}.conv3.weight"] = rng.randn(blk.cout, blk.width, 1, 1).astype(np.float32)
        for b, c in (("bn1", blk.width), ("bn2", blk.width), ("bn3", blk.cout)):
            for s in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{tp}.{b}.{s}"] = rng.rand(c).astype(np.float32)
        if blk.downsample:
            sd[f"{tp}.downsample.0.weight"] = rng.randn(blk.cout, blk.cin, 1, 1).astype(np.float32)
            for s in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{tp}.downsample.1.{s}"] = rng.rand(blk.cout).astype(np.float32)

    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )

    cfg = BranchyConfig(
        backbone_depth=50, img_dim=32, n_branches=1, segment_ends=(3,),
        branch_channels=(256,), num_classes=5,
    )
    model = BranchyDeepLabV3(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    imported = IT.convert_state_dict(sd, cfg)
    merged = IT.merge_variables(variables, imported)

    # stem kernel transposed correctly
    np.testing.assert_allclose(
        np.asarray(merged["params"]["stem"]["conv1"]["kernel"]),
        np.transpose(sd["backbone.conv1.weight"], (2, 3, 1, 0)),
    )
    # a deep block's BN stats landed
    np.testing.assert_allclose(
        np.asarray(merged["batch_stats"]["block_15"]["bn3"]["mean"]),
        sd["backbone.layer4.2.bn3.running_mean"],
    )
    # branch heads untouched (kept their init)
    b0 = variables["params"]["branch_0"]["aspp"]["conv0"]["kernel"]
    b1 = merged["params"]["branch_0"]["aspp"]["conv0"]["kernel"]
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1))

    # shape mismatch raises
    bad = dict(sd)
    bad["backbone.conv1.weight"] = rng.randn(64, 3, 3, 3).astype(np.float32)
    with pytest.raises(ValueError):
        IT.merge_variables(variables, IT.convert_state_dict(bad, cfg))
