#!/usr/bin/env python3
"""Branch-placement boundary parity harness (VERDICT r02 #2, SURVEY hard
part #5).

The reference places branches where *pthflops* says cumulative FLOPs cross
``flop_pos * (k + 1 + skip)`` (/root/reference/from_deepv3_new.py:75-95);
our ``place_branches`` uses the analytic table (1 MAC = 1 FLOP).  pthflops
itself is not installed (and counts ops from a traced graph with its own
per-op rules), so boundary parity is established by *convention
robustness*: this harness re-runs the reference's exact split rule under a
family of counting conventions spanning every plausible pthflops-like
accounting —

  * pure conv MACs only (nothing else counted),
  * MACs + bias adds,
  * 2 FLOPs per MAC with BN/ReLU/add/pool elementwise terms,
  * our flops.py convention (MACs, BN=2/elem, ReLU/add=1/elem, pool=k²),
  * a "count everything generously" convention (BN=4/elem, interpolate
    counted),

and checks the resulting ``segment_ends`` against ``place_branches`` for
n ∈ {1..7} × skip ∈ {0,1} × img ∈ {256, 512} × depth ∈ {50, 101} ×
count_branches ∈ {False, True}.  The placement decision depends only on
cumulative-FLOPs *ratios*; conv MACs dominate every convention by >2
orders of magnitude, so agreement across the family is strong evidence the
true pthflops boundary is the same (disagreements, if any, print as a
boundary table).

Run as a script for the full report table (goes into PARITY.md);
tests/test_placement_parity.py asserts the agreement.
"""

from __future__ import annotations

import dataclasses
import sys


@dataclasses.dataclass(frozen=True)
class Convention:
    """Per-op counting rules (all costs per output element unless noted)."""

    name: str
    mac_factor: float = 1.0   # conv cost = mac_factor * MACs
    bias: float = 0.0         # conv bias adds per output element
    bn: float = 0.0           # batchnorm cost per element
    act: float = 0.0          # relu / elementwise-add cost per element
    pool_k2: bool = False     # maxpool costs k^2 per output element
    gap: float = 0.0          # global-average-pool cost per *input* element
    interp: float = 0.0       # bilinear-resize cost per output element


CONVENTIONS = (
    Convention("macs_only"),
    Convention("macs_bias", bias=1.0),
    Convention("flops2x_full", mac_factor=2.0, bias=1.0, bn=2.0, act=1.0,
               pool_k2=True, gap=1.0, interp=7.0),
    Convention("ours", mac_factor=1.0, bias=1.0, bn=2.0, act=1.0,
               pool_k2=True, gap=1.0, interp=7.0),
    Convention("generous", mac_factor=2.0, bias=1.0, bn=4.0, act=1.0,
               pool_k2=True, gap=1.0, interp=7.0),
)


def _conv(c: Convention, h, w, cin, cout, k, stride=1, bias=False):
    oh, ow = -(-h // stride), -(-w // stride)
    cost = c.mac_factor * oh * ow * cout * cin * k * k
    if bias:
        cost += c.bias * oh * ow * cout
    return cost


def _block_cost(c: Convention, blk, h, w):
    """One torchvision Bottleneck under convention ``c`` (same op list as
    resnet.BlockSpec.flops)."""
    oh, ow = -(-h // blk.stride), -(-w // blk.stride)
    cost = _conv(c, h, w, blk.cin, blk.width, 1)
    cost += (c.bn + c.act) * h * w * blk.width
    cost += _conv(c, h, w, blk.width, blk.width, 3, stride=blk.stride)
    cost += (c.bn + c.act) * oh * ow * blk.width
    cost += _conv(c, oh, ow, blk.width, blk.cout, 1)
    cost += c.bn * oh * ow * blk.cout
    if blk.downsample:
        cost += _conv(c, h, w, blk.cin, blk.cout, 1, stride=blk.stride)
        cost += c.bn * oh * ow * blk.cout
    cost += 2 * c.act * oh * ow * blk.cout  # residual add + relu
    return cost


def _stem_cost(c: Convention, h, w):
    oh, ow = -(-h // 2), -(-w // 2)
    cost = _conv(c, h, w, 3, 64, 7, stride=2)
    cost += (c.bn + c.act) * oh * ow * 64
    ph, pw = -(-oh // 2), -(-ow // 2)
    if c.pool_k2:
        cost += ph * pw * 64 * 9
    return cost


def _head_cost(c: Convention, h, w, cin, classes=21, mid=256, n_rates=3):
    """torchvision DeepLabHead under convention ``c`` (what __check_flops
    counts for a placed branch, from_deepv3_new.py:108-113)."""
    cost = _conv(c, h, w, cin, mid, 1) + (c.bn + c.act) * h * w * mid
    for _ in range(n_rates):
        cost += _conv(c, h, w, cin, mid, 3) + (c.bn + c.act) * h * w * mid
    # pooling branch: GAP + 1x1 on 1x1 + upsample back
    cost += c.gap * h * w * cin
    cost += _conv(c, 1, 1, cin, mid, 1) + (c.bn + c.act) * mid
    cost += c.interp * h * w * mid
    # projection over (n_rates + 2) * mid channels
    cost += _conv(c, h, w, (n_rates + 2) * mid, mid, 1)
    cost += (c.bn + c.act) * h * w * mid
    # 3x3 conv + BN + ReLU + 1x1 classifier
    cost += _conv(c, h, w, mid, mid, 3) + (c.bn + c.act) * h * w * mid
    cost += _conv(c, h, w, mid, classes, 1, bias=True)
    return cost


def reference_rule_placement(c: Convention, spec, n, img_dim, skip=0,
                             count_branches=True, num_classes=21):
    """The reference's split loop (from_deepv3_new.py:68-95) verbatim, costs
    supplied by convention ``c``: tot_flops over the bare backbone, running
    prefix cost (+ placed branch heads when count_branches), close a segment
    when ``tot > running > flop_pos * (k + 1 + skip)``."""
    ih = iw = img_dim
    geo = spec.block_geometry(ih, iw)

    h, w = -(-ih // 4), -(-iw // 4)
    costs = []
    for blk in spec.blocks:
        bh, bw, _ = geo[len(costs)]
        costs.append(_block_cost(c, blk, bh, bw))
    tot = _stem_cost(c, ih, iw) + sum(costs)
    flop_pos = tot / (n + 1)

    ends, chans = [], []
    running = _stem_cost(c, ih, iw)
    branch_extra = 0.0
    for i, blk in enumerate(spec.blocks):
        running += costs[i]
        k = len(ends)
        check = running + (branch_extra if count_branches else 0.0)
        if n > k and tot > check > flop_pos * (k + 1 + skip):
            ends.append(i + 1)
            chans.append(blk.cout)
            bh, bw, _ = blk.out_shape(*geo[i][:2])
            if count_branches:
                branch_extra += _head_cost(c, bh, bw, blk.cout,
                                           classes=num_classes)
    return tuple(ends), tuple(chans)


def compare_all(depths=(50, 101), ns=range(1, 8), skips=(0, 1),
                dims=(256, 512), count_branches_opts=(False, True)):
    """-> (rows, disagreements): each row is one config's boundary sets."""
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import place_branches
    from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs

    rows = []
    disagreements = []
    for depth in depths:
        spec = resnet_block_specs(depth)
        for dim in dims:
            for n in ns:
                for skip in skips:
                    for cb in count_branches_opts:
                        ours, _ = place_branches(
                            spec, n, dim, count_branches=cb, skip=skip)
                        per_conv = {}
                        for c in CONVENTIONS:
                            ends, _ = reference_rule_placement(
                                c, spec, n, dim, skip=skip, count_branches=cb)
                            per_conv[c.name] = ends
                        agree = all(v == ours for v in per_conv.values())
                        rows.append(dict(depth=depth, dim=dim, n=n, skip=skip,
                                         count_branches=cb, ours=ours,
                                         conventions=per_conv, agree=agree))
                        if not agree:
                            disagreements.append(rows[-1])
    return rows, disagreements


def main():
    rows, disagreements = compare_all()
    print(f"{len(rows)} configs; {len(disagreements)} disagreements")
    # boundary table (dedup by depth/dim: ends are identical across agreeing
    # conventions, so print ours)
    last = None
    for r in rows:
        key = (r["depth"], r["dim"])
        if key != last:
            print(f"\n-- resnet{r['depth']} @ {r['dim']}² "
                  f"(segment_ends = exclusive block index per branch)")
            last = key
        mark = "" if r["agree"] else "   <-- DISAGREES"
        print(f"  n={r['n']} skip={r['skip']} cb={int(r['count_branches'])}: "
              f"{r['ours']}{mark}")
        if not r["agree"]:
            for name, ends in r["conventions"].items():
                if ends != r["ours"]:
                    print(f"      {name}: {ends}")
    return 1 if disagreements else 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    sys.exit(main())
