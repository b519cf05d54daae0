"""Branch-placement boundary parity (VERDICT r02 #2, SURVEY hard part #5).

The reference places branches where pthflops-measured cumulative FLOPs
cross ``flop_pos * (k + 1 + skip)`` (/root/reference/from_deepv3_new.py:
68-95); ``place_branches`` uses the analytic table.  pthflops is not
installed, so parity is established by convention robustness: the
reference's exact split rule is re-run under five counting conventions
spanning every plausible pthflops-like accounting (pure MACs .. 2-FLOP MACs
with BN/ReLU/add/pool/interp terms), for n ∈ {1..7} × skip ∈ {0,1} ×
img ∈ {256, 512} × depth ∈ {50, 101} × count_branches ∈ {False, True} —
112 configs.  The boundaries are identical in every cell (conv MACs
dominate by >2 orders of magnitude, so the equipartition ratios are
insensitive to the elementwise terms); PARITY.md carries the boundary
table from ``python tools/placement_parity.py``.
"""

import pytest

from tools.placement_parity import CONVENTIONS, compare_all, reference_rule_placement


def test_boundaries_agree_across_conventions():
    rows, disagreements = compare_all()
    assert len(rows) == 112
    msg = "\n".join(
        f"depth={d['depth']} dim={d['dim']} n={d['n']} skip={d['skip']} "
        f"cb={d['count_branches']}: ours={d['ours']} vs {d['conventions']}"
        for d in disagreements
    )
    assert not disagreements, f"boundary disagreements:\n{msg}"


def test_known_boundary_values():
    """Spot-anchor the table so silent changes to place_branches or the
    analytic FLOPs surface as a diff here, not only in model shapes."""
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import place_branches
    from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs

    r50 = resnet_block_specs(50)
    r101 = resnet_block_specs(101)
    assert place_branches(r50, 1, 256, count_branches=False)[0] == (14,)
    assert place_branches(r50, 3, 256, count_branches=False)[0] == (11, 14, 15)
    assert place_branches(r50, 3, 256, count_branches=True)[0] == (11, 12)
    # skip pushes the first exit deeper (from_deepv3_new.py:83)
    assert place_branches(r50, 3, 256, count_branches=False, skip=1)[0] == (14, 15)
    # resnet101 has 33 blocks; 3-branch equipartition lands mid-layer3
    ends101, _ = place_branches(r101, 3, 256, count_branches=False)
    assert len(ends101) == 3 and all(7 <= e <= 33 for e in ends101)


def test_branch_channels_match_block_outputs():
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import place_branches
    from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs

    spec = resnet_block_specs(50)
    ends, chans = place_branches(spec, 3, 256, count_branches=False)
    assert chans == tuple(spec.blocks[e - 1].cout for e in ends)


@pytest.mark.parametrize("conv", CONVENTIONS, ids=lambda c: c.name)
def test_reference_rule_runs_per_convention(conv):
    """Each convention is exercised standalone (placement non-empty and
    ordered for a mid-size config)."""
    from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs

    ends, chans = reference_rule_placement(
        conv, resnet_block_specs(50), 3, 256, skip=0, count_branches=True)
    assert list(ends) == sorted(ends) and len(ends) == len(chans)
