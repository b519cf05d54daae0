"""Torch reconstruction of the reference's ``branchyDeepv3`` for lockstep
training parity (tests/test_train_parity_torch.py).

The reference composes torchvision modules (/root/reference/
from_deepv3_new.py:41-54: dilated ResNet trunk split into Sequential
segments, DeepLabHead branches, forward :143-155).  torchvision is not
installed in this image, so the same architecture is rebuilt here with bare
``torch.nn`` — in the reference's EXACT state-dict layout
(``base_model.{s}.{p}.*`` / ``branches.{k}.*`` / ``classifier.*``), so
``models/import_reference.convert_reference_state_dict`` consumes
``model.state_dict()`` directly and both frameworks start from identical
weights.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs


class Bottleneck(nn.Module):
    """torchvision Bottleneck (stride/dilation on conv2)."""

    def __init__(self, spec):
        super().__init__()
        self.conv1 = nn.Conv2d(spec.cin, spec.width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(spec.width)
        self.conv2 = nn.Conv2d(
            spec.width, spec.width, 3, stride=spec.stride,
            padding=spec.dilation, dilation=spec.dilation, bias=False,
        )
        self.bn2 = nn.BatchNorm2d(spec.width)
        self.conv3 = nn.Conv2d(spec.width, spec.cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(spec.cout)
        if spec.downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(spec.cin, spec.cout, 1, stride=spec.stride, bias=False),
                nn.BatchNorm2d(spec.cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return F.relu(out + idn)


class ASPPPooling(nn.Sequential):
    """torchvision ASPPPooling: global pool -> 1x1 -> BN -> ReLU -> resize."""

    def __init__(self, cin, cout):
        super().__init__(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(cin, cout, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )

    def forward(self, x):
        size = x.shape[-2:]
        y = super().forward(x)
        return F.interpolate(y, size=size, mode="bilinear", align_corners=False)


class ASPP(nn.Module):
    def __init__(self, cin, rates=(12, 24, 36), cout=256, dropout=0.5):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                              nn.BatchNorm2d(cout), nn.ReLU())]
        for r in rates:
            mods.append(nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=r, dilation=r, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU()))
        mods.append(ASPPPooling(cin, cout))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(len(mods) * cout, cout, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(), nn.Dropout(dropout))

    def forward(self, x):
        return self.project(torch.cat([m(x) for m in self.convs], dim=1))


def deeplab_head(cin, classes, mid=256, rates=(12, 24, 36), dropout=0.5):
    """torchvision DeepLabHead Sequential (indices 0..4 match the layout
    import_torch._import_deeplab_head expects)."""
    return nn.Sequential(
        ASPP(cin, rates, mid, dropout),
        nn.Conv2d(mid, mid, 3, padding=1, bias=False),
        nn.BatchNorm2d(mid),
        nn.ReLU(),
        nn.Conv2d(mid, classes, 1),
    )


class RefBranchyDeepv3(nn.Module):
    """The reference's branchyDeepv3 structure: ``base_model`` ModuleList of
    Sequential segments (stem modules occupy positions 0-3 of segment 0),
    ``branches`` ModuleList of DeepLabHeads, ``classifier``."""

    def __init__(self, depth, segment_ends, num_classes=21, head_mid=256,
                 dropout=0.5):
        super().__init__()
        spec = resnet_block_specs(depth)
        ends = list(segment_ends) + [len(spec.blocks)]
        segs = []
        start = 0
        for si, e in enumerate(ends):
            mods = []
            if si == 0:
                mods += [
                    nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
                    nn.BatchNorm2d(64),
                    nn.ReLU(),
                    nn.MaxPool2d(3, stride=2, padding=1),
                ]
            mods += [Bottleneck(spec.blocks[i]) for i in range(start, e)]
            segs.append(nn.Sequential(*mods))
            start = e
        self.base_model = nn.ModuleList(segs)
        self.branches = nn.ModuleList([
            deeplab_head(spec.blocks[e - 1].cout, num_classes, mid=head_mid,
                         dropout=dropout)
            for e in segment_ends
        ])
        self.classifier = deeplab_head(spec.blocks[-1].cout, num_classes,
                                       mid=head_mid, dropout=dropout)
        self.n_branches = len(self.branches)

    def forward(self, X):
        # from_deepv3_new.py:143-155 verbatim semantics
        outputs = []
        inp_shape = X.shape[-2:]
        for i in range(self.n_branches):
            X = self.base_model[i](X)
            br = self.branches[i](X)
            br = F.interpolate(br, size=inp_shape, mode="bilinear", align_corners=False)
            outputs.append(br.unsqueeze(0))
        y = self.classifier(self.base_model[-1](X))
        y = F.interpolate(y, size=inp_shape, mode="bilinear", align_corners=False)
        outputs.append(y.unsqueeze(0))
        return torch.cat(outputs)
