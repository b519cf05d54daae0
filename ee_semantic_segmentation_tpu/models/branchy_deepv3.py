"""Branchy DeepLabV3: multi-exit segmenter with analytic branch placement.

Re-designs /root/reference/from_deepv3_new.py for TPU:

* **Branch placement** (`place_branches`): the reference equipartitions the
  backbone's FLOPs into ``n+1`` buckets and closes a segment whenever the
  running total crosses ``flop_pos * (k + 1 + skip)``
  (from_deepv3_new.py:69,83), optionally adding already-placed branch-head
  FLOPs into the running total when ``count_branches`` is set
  (from_deepv3_new.py:108-113).  The reference discovers FLOPs by running
  ``pthflops`` probe forwards per candidate split — an O(n·blocks) stack of
  real model executions at build time.  Here the same rule runs on the
  analytic cost table in microseconds, with identical ratio semantics.
* **Forward**: segments run sequentially; after segment ``i`` its branch head
  produces exit ``i``, bilinearly upsampled to the input size; the final
  segment feeds the main classifier (from_deepv3_new.py:143-155).  Output is
  the stacked ``(n_exits, N, H, W, C)`` logits.  The whole multi-exit forward
  is a single jitted XLA program — the per-exit heads fuse with the trunk.
* Branch heads default to torchvision's DeepLabHead and switch to the custom
  ``my_branch`` when ``branch_params`` provides ``atrous_rates`` +
  ``nout_channels`` (from_deepv3_new.py:126-131).
* The reference's ``__init_branches`` re-init is a silent no-op
  (SURVEY.md bug #1); here branch heads use Flax's default (proper) init.

Like the reference, the *actual* branch count after placement can be lower
than requested (from_deepv3_new.py:90-95); callers must renegotiate with the
loss via ``loss.update_n`` (deepv3_funcs.py:229-232).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu import flops as F
from ee_semantic_segmentation_tpu.models import aspp as heads
from ee_semantic_segmentation_tpu.models import resnet as R


@dataclasses.dataclass(frozen=True)
class BranchyConfig:
    """Static architecture description (the JSON-serializable "model spec"
    that replaces the reference's whole-module pickles,
    deepv3_funcs.py:186-188)."""

    backbone_depth: int
    img_dim: int | tuple[int, int]  # square side, or (H, W) for non-square
    n_branches: int
    segment_ends: tuple[int, ...]  # block index (exclusive) closing each segment
    branch_channels: tuple[int, ...]  # cin of each branch head
    num_classes: int = 21
    count_branches: bool = True
    skip: int = 0
    branch_params: dict | None = None  # {'atrous_rates': ..., 'nout_channels': ..., 'bottleneck': ...}
    backbone: str = "resnet"  # 'resnet' | 'mobilenet_v3_large'
    classifier_mid: int = 256  # DeepLabHead width (torchvision default 256)
    head_dropout: float = 0.5  # ASPP projection dropout (torchvision default)

    @property
    def n_exits(self) -> int:
        return self.n_branches + 1

    @property
    def img_hw(self) -> tuple[int, int]:
        d = self.img_dim
        return (d, d) if isinstance(d, int) else (int(d[0]), int(d[1]))


def backbone_spec(cfg: "BranchyConfig"):
    """Resolve the static backbone description for a config."""
    if cfg.backbone == "mobilenet_v3_large":
        from ee_semantic_segmentation_tpu.models.mobilenetv3 import mobilenet_v3_block_specs

        return mobilenet_v3_block_specs()
    return R.resnet_block_specs(cfg.backbone_depth)


def _branch_flops_fn(cfg_branch_params, num_classes):
    bp = cfg_branch_params
    if isinstance(bp, dict) and all(k in bp for k in ("nout_channels", "atrous_rates")):
        return lambda h, w, cin: heads.branch_head_flops(
            h,
            w,
            cin,
            num_classes=num_classes,
            nout=bp["nout_channels"],
            n_rates=len(bp["atrous_rates"]),
            bottleneck=bp.get("bottleneck"),
        )
    return lambda h, w, cin: heads.deeplab_head_flops(h, w, cin, num_classes=num_classes)


def place_branches(
    spec: R.BackboneSpec,
    n: int,
    img_dim: int | tuple[int, int],
    count_branches: bool = True,
    skip: int = 0,
    branch_params: dict | None = None,
    num_classes: int = 21,
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """FLOPs-equipartition branch placement (from_deepv3_new.py:68-95).

    Returns (segment_ends, branch_channels): ``segment_ends[k]`` is the
    exclusive block index closing segment ``k`` (one entry per placed branch;
    the final segment runs to the end), ``branch_channels[k]`` is the channel
    count feeding branch ``k``.
    """
    ih, iw = (img_dim, img_dim) if isinstance(img_dim, int) else img_dim
    cum = spec.cumulative_flops(ih, iw)
    geo = spec.block_geometry(ih, iw)
    tot_flops = cum[-1]
    flop_pos = tot_flops / (n + 1)
    bflops = _branch_flops_fn(branch_params, num_classes)

    segment_ends: list[int] = []
    branch_channels: list[int] = []
    branch_extra = 0  # accumulated branch-head FLOPs (count_branches mode)
    for i, blk in enumerate(spec.blocks):
        k = len(segment_ends)
        running = cum[i] + (branch_extra if count_branches else 0)
        if n > k and tot_flops > running > flop_pos * (k + 1 + skip):
            segment_ends.append(i + 1)
            # branch head sees the *output* of block i
            if i + 1 < len(geo):
                bh, bw, _ = geo[i + 1]
            else:
                bh, bw, _ = spec.blocks[i].out_shape(*geo[i][:2])
            cout = spec.blocks[i].cout
            branch_channels.append(cout)
            if count_branches:
                branch_extra += bflops(bh, bw, cout)
    return tuple(segment_ends), tuple(branch_channels)


class BranchyDeepLabV3(nn.Module):
    """Multi-exit DeepLabV3 with a dilated ResNet trunk (NHWC)."""

    config: BranchyConfig
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None
    remat: bool = False  # rematerialize trunk blocks (full-res training)
    stem_s2d: bool = False  # exact space-to-depth stem conv (see resnet.py)

    def setup(self):
        cfg = self.config
        spec = backbone_spec(cfg)
        self.spec = spec
        common = dict(dtype=self.dtype, bn_momentum=self.bn_momentum, axis_name=self.axis_name)
        if cfg.backbone == "mobilenet_v3_large":
            from ee_semantic_segmentation_tpu.models import mobilenetv3 as M

            stem_cls, block_cls = M.MNV3Stem, M.InvertedResidual
        else:
            stem_cls, block_cls = R.ResNetStem, R.Bottleneck
        if self.remat:
            # trade FLOPs for HBM: recompute trunk activations in backward
            # (jax.checkpoint per block) — enables 2048x1024 training configs
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        if self.stem_s2d and stem_cls is R.ResNetStem:
            self.stem = stem_cls(s2d=True, **common)
        else:
            self.stem = stem_cls(**common)
        self.blocks = [
            block_cls(blk, name=f"block_{i}", **common)
            for i, blk in enumerate(spec.blocks)
        ]
        bp = cfg.branch_params
        use_custom = isinstance(bp, dict) and all(
            k in bp for k in ("nout_channels", "atrous_rates")
        )
        branch_list = []
        for k in range(cfg.n_branches):
            if use_custom:
                branch_list.append(
                    heads.BranchHead(
                        num_classes=cfg.num_classes,
                        nout_channels=bp["nout_channels"],
                        atrous_rates=tuple(bp["atrous_rates"]),
                        bottleneck=bp.get("bottleneck"),
                        dropout_rate=cfg.head_dropout,
                        dtype=self.dtype,
                        bn_momentum=self.bn_momentum,
                        axis_name=self.axis_name,
                        name=f"branch_{k}",
                    )
                )
            else:
                branch_list.append(
                    heads.DeepLabHead(
                        num_classes=cfg.num_classes,
                        dropout_rate=cfg.head_dropout,
                        dtype=self.dtype,
                        bn_momentum=self.bn_momentum,
                        axis_name=self.axis_name,
                        name=f"branch_{k}",
                    )
                )
        self.branches = branch_list
        self.classifier = heads.DeepLabHead(
            num_classes=cfg.num_classes,
            mid_channels=cfg.classifier_mid,
            dropout_rate=cfg.head_dropout,
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            name="classifier",
        )

    @property
    def n_branches(self) -> int:
        return self.config.n_branches

    def _upsample(self, y, out_hw):
        n, _, _, c = y.shape
        # at least f32 for the resize (bf16 logits upsample in f32); f64
        # passes through untouched (numeric-parity tests run in x64)
        y = jax.image.resize(
            y.astype(jnp.promote_types(y.dtype, jnp.float32)),
            (n, out_hw[0], out_hw[1], c), method="bilinear"
        )
        return y

    def run_segment(self, idx: int, x, train: bool = False):
        """Run segment ``idx`` of the trunk (stem folds into segment 0).

        Used by the sequential early-exit engine (ee/sequential.py) which
        mirrors ee_dnn_op.py's segment-at-a-time execution.
        """
        start = 0 if idx == 0 else self.config.segment_ends[idx - 1]
        ends = list(self.config.segment_ends) + [len(self.blocks)]
        end = ends[idx]
        if idx == 0:
            x = self.stem(x, train=train)
        for b in self.blocks[start:end]:
            x = b(x, train)  # positional: nn.remat static_argnums needs it
        return x

    def run_branch(self, idx: int, x, out_hw, train: bool = False):
        y = self.branches[idx](x, train=train)
        return self._upsample(y, out_hw)

    def run_classifier(self, x, out_hw, train: bool = False):
        y = self.classifier(x, train=train)
        return self._upsample(y, out_hw)

    def __call__(self, x, train: bool = False):
        """Full multi-exit forward -> (n_exits, N, H, W, C) float32 logits."""
        cfg = self.config
        out_hw = x.shape[1:3]
        outputs = []
        for i in range(cfg.n_branches):
            x = self.run_segment(i, x, train=train)
            outputs.append(self.run_branch(i, x, out_hw, train=train))
        x = self.run_segment(cfg.n_branches, x, train=train)
        outputs.append(self.run_classifier(x, out_hw, train=train))
        return jnp.stack(outputs)

    def lowres_logits(self, x, train: bool = False):
        """Per-exit LOW-RES logits (list of (N, h_k, w_k, C)) — the forward
        without the bilinear upsamples.  Feeds the fused Pallas
        upsample+argmax eval head (ops/pallas/upsample_argmax.py), which
        replaces the (E, N, H, W, C) float32 HBM materialization of the
        standard eval path."""
        cfg = self.config
        outputs = []
        for i in range(cfg.n_branches):
            x = self.run_segment(i, x, train=train)
            outputs.append(self.branches[i](x, train=train))
        x = self.run_segment(cfg.n_branches, x, train=train)
        outputs.append(self.classifier(x, train=train))
        return outputs

    # ---------------------------------------------------------------- FLOPs
    def flops_table(self, img_dim: int | tuple[int, int] | None = None):
        """Per-segment / per-branch FLOPs (analytic) — the equivalent of
        eval_flops.count_flops (eval_flops.py:28-50).

        Returns dict with 'segments' (list, incl. final), 'branches' (list,
        incl. classifier), 'cumulative_exits' (prefix-summed trunk + head per
        exit, the b{i}_flops CSV column)."""
        cfg = self.config
        if img_dim is None:
            img_dim = cfg.img_dim
        h, w = (img_dim, img_dim) if isinstance(img_dim, int) else img_dim
        spec = backbone_spec(cfg)
        cum = spec.cumulative_flops(h, w)
        geo = spec.block_geometry(h, w)
        ends = list(cfg.segment_ends) + [len(spec.blocks)]
        bflops = _branch_flops_fn(cfg.branch_params, cfg.num_classes)

        seg_flops = []
        prev = 0
        prev_cum = 0
        for e in ends:
            seg_flops.append(cum[e - 1] - prev_cum)
            prev_cum = cum[e - 1]
            prev = e

        br_flops = []
        for k, e in enumerate(ends[:-1]):
            bh, bw, _ = spec.blocks[e - 1].out_shape(*geo[e - 1][:2])
            br_flops.append(bflops(bh, bw, spec.blocks[e - 1].cout))
        # classifier head on final trunk output
        fh, fw, _ = spec.blocks[-1].out_shape(*geo[-1][:2])
        br_flops.append(
            heads.deeplab_head_flops(
                fh, fw, spec.blocks[-1].cout, num_classes=cfg.num_classes,
                mid=cfg.classifier_mid,
            )
        )

        cumulative = []
        running = 0
        for s, b in zip(seg_flops, br_flops):
            running += s
            cumulative.append(running + b)
        return {"segments": seg_flops, "branches": br_flops, "cumulative_exits": cumulative}


def build_branchy_deeplabv3(
    depth: int = 101,
    n: int = 0,
    img_dim: int | tuple[int, int] = 256,
    count_branches: bool = True,
    skip: int = 0,
    branch_params: dict | None = None,
    num_classes: int = 21,
    dtype: Any = jnp.float32,
    axis_name: str | None = None,
    backbone: str = "resnet",
    classifier_mid: int = 256,
) -> BranchyDeepLabV3:
    """Build the model the way the reference's constructor does
    (from_deepv3_new.py:57-97): place branches by FLOPs equipartition, then
    instantiate.  The realized ``n_branches`` may be smaller than requested."""
    if isinstance(img_dim, (tuple, list)):
        img_dim = tuple(int(d) for d in img_dim)
        if img_dim[0] == img_dim[1]:
            img_dim = img_dim[0]
    probe = BranchyConfig(
        backbone_depth=depth, img_dim=img_dim, n_branches=0, segment_ends=(),
        branch_channels=(), backbone=backbone,
    )
    spec = backbone_spec(probe)
    ends, chans = place_branches(
        spec, n, img_dim, count_branches=count_branches, skip=skip,
        branch_params=branch_params, num_classes=num_classes,
    )
    cfg = BranchyConfig(
        backbone_depth=depth,
        img_dim=img_dim,
        n_branches=len(ends),
        segment_ends=ends,
        branch_channels=chans,
        num_classes=num_classes,
        count_branches=count_branches,
        skip=skip,
        branch_params=branch_params,
        backbone=backbone,
        classifier_mid=classifier_mid,
    )
    return BranchyDeepLabV3(config=cfg, dtype=dtype, axis_name=axis_name)
