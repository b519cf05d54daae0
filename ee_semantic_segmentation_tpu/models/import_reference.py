"""Import trained *reference* branchyDeepv3 checkpoints (migration path).

The reference saves ``state_dict``s whose structure encodes its segment
split (/root/reference/from_deepv3_new.py:75-97):

    base_model.0.0.*          stem conv1            (Sequential pos 0)
    base_model.0.1.*          stem bn1              (pos 1; relu/maxpool 2-3)
    base_model.0.{4+j}.*      j-th bottleneck of segment 0
    base_model.{s}.{j}.*      j-th bottleneck of segment s >= 1
    branches.{k}.{...}        DeepLabHead Sequential (0=ASPP, 1=conv, 2=bn, 4=1x1)
    classifier.{...}          main DeepLabHead

:func:`convert_reference_state_dict` parses that layout, *reconstructs the
segment boundaries from the keys alone*, and produces our flax variables +
a matching :class:`BranchyConfig` — so a model trained with the PyTorch
reference runs on TPU unchanged.  (Custom ``my_branch`` heads with a
bottleneck conv are also recognized by their 6-module Sequential shape.)
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Mapping

import numpy as np

from ee_semantic_segmentation_tpu.models import import_torch as IT
from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyConfig

_DEPTH_BY_BLOCKS = {16: 50, 33: 101}


def _segment_layout(sd: Mapping) -> tuple[list[int], int]:
    """-> (blocks per segment, n_branches) parsed from base_model keys."""
    seg_positions: dict[int, set[int]] = defaultdict(set)
    for k in sd:
        m = re.match(r"base_model\.(\d+)\.(\d+)\.", k)
        if m:
            seg_positions[int(m.group(1))].add(int(m.group(2)))
    if not seg_positions:
        raise ValueError("not a reference branchyDeepv3 state dict (no base_model.* keys)")
    n_segments = max(seg_positions) + 1
    blocks_per_segment = []
    for s in range(n_segments):
        pos = seg_positions[s]
        if s == 0:
            # positions 0..3 are stem conv/bn/relu/maxpool; blocks start at 4
            blocks_per_segment.append(len([p for p in pos if p >= 4]))
        else:
            blocks_per_segment.append(len(pos))
    n_branches = len(
        {re.match(r"branches\.(\d+)\.", k).group(1) for k in sd if k.startswith("branches.")}
    )
    return blocks_per_segment, n_branches


def convert_reference_state_dict(sd: Mapping, img_dim: int = 256, num_classes: int = 21):
    """Reference branchyDeepv3 state dict -> (config, {'params', 'batch_stats'}).

    The returned variables cover stem, all trunk blocks, every branch head
    and the classifier; merge over an init tree with
    :func:`import_torch.merge_variables`.
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    blocks_per_segment, n_branches = _segment_layout(sd)
    total_blocks = sum(blocks_per_segment)
    depth = _DEPTH_BY_BLOCKS.get(total_blocks)
    if depth is None:
        raise ValueError(f"unrecognized backbone: {total_blocks} bottleneck blocks")

    # exclusive block index closing each segment (all but the last segment)
    ends = []
    run = 0
    for n in blocks_per_segment[:-1]:
        run += n
        ends.append(run)

    params: dict = {}
    stats: dict = {}
    # stem
    IT._import_conv(params, sd, "base_model.0.0", ("stem", "conv1"))
    IT._import_bn(params, stats, sd, "base_model.0.1", ("stem", "bn1"))

    # trunk blocks: map (segment, position) -> flat block index
    flat = 0
    from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs

    spec = resnet_block_specs(depth)
    branch_channels = []
    for s, n in enumerate(blocks_per_segment):
        base_pos = 4 if s == 0 else 0
        for j in range(n):
            tp = f"base_model.{s}.{base_pos + j}"
            fp = (f"block_{flat}",)
            for c in ("conv1", "conv2", "conv3"):
                IT._import_conv(params, sd, f"{tp}.{c}", fp + (c,))
            for b in ("bn1", "bn2", "bn3"):
                IT._import_bn(params, stats, sd, f"{tp}.{b}", fp + (b,))
            if f"{tp}.downsample.0.weight" in sd:
                IT._import_conv(params, sd, f"{tp}.downsample.0", fp + ("downsample_conv",))
                IT._import_bn(params, stats, sd, f"{tp}.downsample.1", fp + ("downsample_bn",))
            flat += 1
        if s < len(blocks_per_segment) - 1:
            branch_channels.append(spec.blocks[flat - 1].cout)

    # branch heads (DeepLabHead Sequential shape, like torchvision's)
    for k in range(n_branches):
        IT._import_deeplab_head(params, stats, sd, f"branches.{k}", (f"branch_{k}",))
    # main classifier
    IT._import_deeplab_head(params, stats, sd, "classifier", ("classifier",))

    cfg = BranchyConfig(
        backbone_depth=depth,
        img_dim=img_dim,
        n_branches=n_branches,
        segment_ends=tuple(ends),
        branch_channels=tuple(branch_channels),
        num_classes=num_classes,
    )
    return cfg, {"params": params, "batch_stats": stats}


def import_reference_checkpoint(path: str, img_dim: int = 256, num_classes: int = 21):
    """Load a reference ``.pth`` (state dict or training checkpoint) and
    convert.  Whole-module pickles need ``net.state_dict()`` exported first
    (see import_torch.load_torch_checkpoint)."""
    sd = IT.load_torch_checkpoint(path)
    return convert_reference_state_dict(sd, img_dim, num_classes)
