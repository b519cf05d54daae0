"""Reference branchyDeepv3 checkpoint migration: synthetic state dict ->
config reconstruction + weight conversion."""

import re

import numpy as np
import pytest

from ee_semantic_segmentation_tpu.models.import_reference import (
    convert_reference_state_dict,
)
from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs


def _bn_entries(sd, prefix, c, rng):
    for s in ("weight", "bias", "running_mean", "running_var"):
        sd[f"{prefix}.{s}"] = (rng.rand(c) + 0.1).astype(np.float32)


def _head_entries(sd, prefix, cin, rng, mid=256, classes=21):
    sd[f"{prefix}.0.convs.0.0.weight"] = rng.randn(mid, cin, 1, 1).astype(np.float32)
    _bn_entries(sd, f"{prefix}.0.convs.0.1", mid, rng)
    for i in range(1, 4):
        sd[f"{prefix}.0.convs.{i}.0.weight"] = rng.randn(mid, cin, 3, 3).astype(np.float32)
        _bn_entries(sd, f"{prefix}.0.convs.{i}.1", mid, rng)
    sd[f"{prefix}.0.convs.4.1.weight"] = rng.randn(mid, cin, 1, 1).astype(np.float32)
    _bn_entries(sd, f"{prefix}.0.convs.4.2", mid, rng)
    sd[f"{prefix}.0.project.0.weight"] = rng.randn(mid, mid * 5, 1, 1).astype(np.float32)
    _bn_entries(sd, f"{prefix}.0.project.1", mid, rng)
    sd[f"{prefix}.1.weight"] = rng.randn(mid, mid, 3, 3).astype(np.float32)
    _bn_entries(sd, f"{prefix}.2", mid, rng)
    sd[f"{prefix}.4.weight"] = rng.randn(classes, mid, 1, 1).astype(np.float32)
    sd[f"{prefix}.4.bias"] = rng.randn(classes).astype(np.float32)


def _block_entries(sd, prefix, blk, rng):
    sd[f"{prefix}.conv1.weight"] = rng.randn(blk.width, blk.cin, 1, 1).astype(np.float32)
    sd[f"{prefix}.conv2.weight"] = rng.randn(blk.width, blk.width, 3, 3).astype(np.float32)
    sd[f"{prefix}.conv3.weight"] = rng.randn(blk.cout, blk.width, 1, 1).astype(np.float32)
    _bn_entries(sd, f"{prefix}.bn1", blk.width, rng)
    _bn_entries(sd, f"{prefix}.bn2", blk.width, rng)
    _bn_entries(sd, f"{prefix}.bn3", blk.cout, rng)
    if blk.downsample:
        sd[f"{prefix}.downsample.0.weight"] = rng.randn(blk.cout, blk.cin, 1, 1).astype(np.float32)
        _bn_entries(sd, f"{prefix}.downsample.1", blk.cout, rng)


def make_reference_sd(split_at=12):
    """Synthetic reference state dict: ResNet-50 trunk split into 2 segments
    at block ``split_at``, 1 DeepLabHead branch, main classifier."""
    rng = np.random.RandomState(0)
    spec = resnet_block_specs(50)
    sd = {}
    sd["base_model.0.0.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    _bn_entries(sd, "base_model.0.1", 64, rng)
    for i, blk in enumerate(spec.blocks):
        if i < split_at:
            prefix = f"base_model.0.{4 + i}"
        else:
            prefix = f"base_model.1.{i - split_at}"
        _block_entries(sd, prefix, blk, rng)
    _head_entries(sd, "branches.0", spec.blocks[split_at - 1].cout, rng)
    _head_entries(sd, "classifier", spec.blocks[-1].cout, rng)
    return sd, spec


def test_convert_reference_state_dict():
    sd, spec = make_reference_sd(split_at=12)
    cfg, variables = convert_reference_state_dict(sd, img_dim=256)
    assert cfg.backbone_depth == 50
    assert cfg.n_branches == 1
    assert cfg.segment_ends == (12,)
    assert cfg.branch_channels == (spec.blocks[11].cout,)

    # stem + a block from the SECOND segment landed at the right flat index
    np.testing.assert_allclose(
        np.asarray(variables["params"]["stem"]["conv1"]["kernel"]),
        np.transpose(sd["base_model.0.0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(variables["params"]["block_13"]["conv2"]["kernel"]),
        np.transpose(sd["base_model.1.1.conv2.weight"], (2, 3, 1, 0)),
    )
    # branch + classifier heads mapped
    np.testing.assert_allclose(
        np.asarray(variables["params"]["branch_0"]["aspp"]["conv1"]["kernel"]),
        np.transpose(sd["branches.0.0.convs.1.0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["classifier"]["bn"]["var"]),
        sd["classifier.2.running_var"],
    )


def test_convert_merges_into_model():
    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyDeepLabV3
    from ee_semantic_segmentation_tpu.models.import_torch import merge_variables

    sd, _ = make_reference_sd(split_at=12)
    cfg, imported = convert_reference_state_dict(sd, img_dim=32)
    model = BranchyDeepLabV3(config=cfg)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    )
    # shape-level merge against the abstract tree: every imported leaf must
    # exist with the right shape
    class _Shaped:
        pass

    def leafify(x):
        a = np.zeros(x.shape, np.float32)
        return a

    init_concrete = jax.tree.map(leafify, init)
    merged = merge_variables(init_concrete, imported)
    assert merged["params"]["block_15"]["conv3"]["kernel"].shape == (1, 1, 512, 2048)


def test_reject_unknown_backbone():
    sd, _ = make_reference_sd(split_at=12)
    # drop a block to break the 16-block count
    bad = {k: v for k, v in sd.items() if not k.startswith("base_model.1.3.")}
    with pytest.raises(ValueError):
        convert_reference_state_dict(bad)
