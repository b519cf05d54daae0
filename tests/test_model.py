"""Model-construction tests: branch placement, FLOPs tables, backbone specs."""

import numpy as np
import pytest

from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
    BranchyConfig,
    backbone_spec,
    place_branches,
)
from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs


def test_resnet_spec_structure():
    for depth, n_blocks in ((50, 16), (101, 33)):
        spec = resnet_block_specs(depth)
        assert len(spec.blocks) == n_blocks
        names = [b.name for b in spec.blocks]
        assert names[0] == "layer1.0" and names[-1] == "layer4.2"
        # output-stride 8: layer3/4 stride-free with dilation 2/4
        l3 = [b for b in spec.blocks if b.name.startswith("layer3")]
        l4 = [b for b in spec.blocks if b.name.startswith("layer4")]
        assert all(b.stride == 1 for b in l3) and all(b.stride == 1 for b in l4)
        assert l3[0].dilation == 1 and l3[1].dilation == 2  # previous_dilation rule
        assert l4[0].dilation == 2 and l4[1].dilation == 4
        # stage transitions downsample
        assert spec.blocks[0].downsample  # channel expansion 64 -> 256
        geometry = spec.block_geometry(256, 256)
        assert geometry[0] == (64, 64, 64)


def test_resnet_flops_scale_quadratically():
    spec = resnet_block_specs(50)
    f256 = spec.cumulative_flops(256, 256)[-1]
    f512 = spec.cumulative_flops(512, 512)[-1]
    assert f512 / f256 == pytest.approx(4.0, rel=0.02)


def test_placement_monotonic_and_deterministic():
    spec = resnet_block_specs(101)
    prev_first = len(spec.blocks)
    for n in (1, 2, 4, 7):
        ends, chans = place_branches(spec, n, 256, count_branches=False)
        assert ends == place_branches(spec, n, 256, count_branches=False)[0]
        assert list(ends) == sorted(ends)
        assert len(ends) <= n
        # more branches -> first exit moves earlier (or stays)
        assert ends[0] <= prev_first
        prev_first = ends[0]
        assert all(c in (256, 512, 1024, 2048) for c in chans)


def test_skip_pushes_first_exit_deeper():
    spec = resnet_block_specs(101)
    e0, _ = place_branches(spec, 4, 256, count_branches=False, skip=0)
    e1, _ = place_branches(spec, 4, 256, count_branches=False, skip=1)
    assert e1[0] > e0[0]


def test_count_branches_shrinks_branch_count():
    """Head FLOPs eat the budget: count_branches=True realizes fewer/later
    branches, mirroring the reference's renegotiation behavior
    (from_deepv3_new.py:90-95, deepv3_funcs.py:229-238)."""
    spec = resnet_block_specs(101)
    e_without, _ = place_branches(spec, 7, 256, count_branches=False)
    e_with, _ = place_branches(spec, 7, 256, count_branches=True)
    assert len(e_with) <= len(e_without)


def test_flops_table_consistency(tiny_model):
    t = tiny_model.flops_table(32)
    assert len(t["segments"]) == 2 and len(t["branches"]) == 2
    # cumulative exits = prefix sums of segments + per-exit head
    assert t["cumulative_exits"][0] == pytest.approx(t["segments"][0] + t["branches"][0])
    assert t["cumulative_exits"][1] == pytest.approx(
        t["segments"][0] + t["segments"][1] + t["branches"][1]
    )


def test_mobilenet_spec():
    cfg = BranchyConfig(
        backbone_depth=0, img_dim=64, n_branches=0, segment_ends=(),
        branch_channels=(), backbone="mobilenet_v3_large",
    )
    spec = backbone_spec(cfg)
    assert len(spec.blocks) == 16  # 15 inverted residuals + final 1x1
    assert spec.blocks[-1].cout == 960
    # dilated last stage: no stride-2 after block 12
    assert all(b.stride == 1 for b in spec.blocks[12:])
    geo = spec.block_geometry(64, 64)
    h, w, _ = spec.blocks[-1].out_shape(*geo[-1][:2])
    assert (h, w) == (4, 4)  # output stride 16


def test_config_json_roundtrip(tmp_path, tiny_model):
    import dataclasses
    import json

    cfg = tiny_model.config
    as_json = json.dumps(dataclasses.asdict(cfg))
    back = json.loads(as_json)
    back["segment_ends"] = tuple(back["segment_ends"])
    back["branch_channels"] = tuple(back["branch_channels"])
    assert BranchyConfig(**back) == cfg


def test_mnv3_branch_placement_equipartition():
    """FLOPs-equipartition placement on the MNv3 table (VERDICT #3): a
    2-branch build realizes 2 exits with each segment's cumulative trunk
    FLOPs crossing its flop_pos*(k+1) threshold."""
    cfg = BranchyConfig(
        backbone_depth=0, img_dim=224, n_branches=0, segment_ends=(),
        branch_channels=(), backbone="mobilenet_v3_large",
    )
    spec = backbone_spec(cfg)
    ends, chans = place_branches(spec, 2, 224, count_branches=False)
    assert len(ends) == 2 and list(ends) == sorted(ends)
    cum = spec.cumulative_flops(224, 224)
    flop_pos = cum[-1] / 3
    for k, e in enumerate(ends):
        assert cum[e - 1] > flop_pos * (k + 1)          # crossed its bucket
        if e >= 2:
            assert cum[e - 2] <= flop_pos * (k + 1) or k > 0
    assert all(c == spec.blocks[e - 1].cout for c, e in zip(chans, ends))


def test_non_square_placement_and_forward():
    """(H, W) img_dim flows through placement, the flops table, and the
    forward shape (non-square training configs, e.g. Cityscapes 512x1024)."""
    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyDeepLabV3,
        build_branchy_deeplabv3,
    )

    model = build_branchy_deeplabv3(
        depth=0, n=1, img_dim=(32, 64), backbone="mobilenet_v3_large",
        count_branches=False, num_classes=5, classifier_mid=16,
        branch_params={"nout_channels": 16, "atrous_rates": (2, 4, 6)},
    )
    assert model.config.img_hw == (32, 64)
    t = model.flops_table()
    assert all(f > 0 for f in t["cumulative_exits"])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), train=False)
    out = model.apply(variables, jnp.zeros((2, 32, 64, 3)), train=False)
    assert out.shape == (model.config.n_exits, 2, 32, 64, 5)
