"""Import torchvision DeepLabV3 checkpoints into the Flax model.

The reference builds on torchvision's pretrained ``deeplabv3_resnet{50,101}``
(/root/reference/from_deepv3_new.py:41-54) and pickles whole modules.  Our
checkpoints are Orbax param trees + a JSON model spec; this module bridges
from the torch world so users can bring their existing weights:

* ``convert_state_dict(sd, config)`` — torchvision ``state_dict()`` (or the
  ``model_state_dict`` inside the reference's training checkpoints,
  train_funcs.py:208-216) -> ``{'params': ..., 'batch_stats': ...}`` for
  :class:`~ee_semantic_segmentation_tpu.models.branchy_deepv3.BranchyDeepLabV3`.
* layout: torch conv ``(O, I, kh, kw)`` -> flax ``(kh, kw, I, O)``; BN
  weight/bias/running_mean/running_var -> scale/bias/mean/var.

Only the backbone + main classifier are importable from a plain torchvision
dict; branch heads keep their fresh initialization (the reference's branch
re-init was a silent no-op anyway — SURVEY.md bug #1 — so torchvision-default
heads are what its branches effectively were).

torch is only imported lazily (CPU build is available in this image); numpy
arrays pass through, so tests can feed synthetic dicts without torch.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from ee_semantic_segmentation_tpu.models.branchy_deepv3 import BranchyConfig
from ee_semantic_segmentation_tpu.models.resnet import resnet_block_specs


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(t) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(_np(t), (2, 3, 1, 0))


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _import_bn(params, stats, sd, torch_prefix, flax_path):
    _set(params, flax_path + ("scale",), _np(sd[f"{torch_prefix}.weight"]))
    _set(params, flax_path + ("bias",), _np(sd[f"{torch_prefix}.bias"]))
    _set(stats, flax_path + ("mean",), _np(sd[f"{torch_prefix}.running_mean"]))
    _set(stats, flax_path + ("var",), _np(sd[f"{torch_prefix}.running_var"]))


def _import_conv(params, sd, torch_prefix, flax_path):
    _set(params, flax_path + ("kernel",), _conv(sd[f"{torch_prefix}.weight"]))
    if f"{torch_prefix}.bias" in sd:
        _set(params, flax_path + ("bias",), _np(sd[f"{torch_prefix}.bias"]))


def _import_deeplab_head(params, stats, sd, torch_prefix, flax_prefix, n_rates=3):
    """torchvision DeepLabHead: Sequential(ASPP, Conv3x3, BN, ReLU, Conv1x1).

    ASPP convs: convs.0 = Sequential(conv, bn, relu); convs.{1..n} atrous;
    convs.{n+1} = Sequential(pool, conv, bn, relu); then project.
    """
    aspp = flax_prefix + ("aspp",)
    _import_conv(params, sd, f"{torch_prefix}.0.convs.0.0", aspp + ("conv0",))
    _import_bn(params, stats, sd, f"{torch_prefix}.0.convs.0.1", aspp + ("bn0",))
    for i in range(1, n_rates + 1):
        _import_conv(params, sd, f"{torch_prefix}.0.convs.{i}.0", aspp + (f"conv{i}",))
        _import_bn(params, stats, sd, f"{torch_prefix}.0.convs.{i}.1", aspp + (f"bn{i}",))
    p = n_rates + 1
    _import_conv(params, sd, f"{torch_prefix}.0.convs.{p}.1", aspp + ("pool_conv",))
    _import_bn(params, stats, sd, f"{torch_prefix}.0.convs.{p}.2", aspp + ("pool_bn",))
    _import_conv(params, sd, f"{torch_prefix}.0.project.0", aspp + ("project",))
    _import_bn(params, stats, sd, f"{torch_prefix}.0.project.1", aspp + ("project_bn",))
    _import_conv(params, sd, f"{torch_prefix}.1", flax_prefix + ("conv",))
    _import_bn(params, stats, sd, f"{torch_prefix}.2", flax_prefix + ("bn",))
    _import_conv(params, sd, f"{torch_prefix}.4", flax_prefix + ("classifier",))


def _import_mnv3_block(params, stats, sd, torch_prefix, flax_prefix, blk):
    """One torchvision MobileNetV3 InvertedResidual (``<i>.block.<j>``
    Sequential: optional expand Conv2dNormActivation, depthwise, optional
    SqueezeExcitation(fc1/fc2), project) -> the flax InvertedResidual names.
    """
    dot = f"{torch_prefix}." if torch_prefix else ""
    if blk.is_conv1x1:  # features[16]: Conv2dNormActivation to 960
        _import_conv(params, sd, f"{dot}0", flax_prefix + ("conv",))
        _import_bn(params, stats, sd, f"{dot}1", flax_prefix + ("bn",))
        return
    tp = f"{dot}block"
    j = 0
    if blk.exp != blk.cin:
        _import_conv(params, sd, f"{tp}.{j}.0", flax_prefix + ("expand",))
        _import_bn(params, stats, sd, f"{tp}.{j}.1", flax_prefix + ("expand_bn",))
        j += 1
    _import_conv(params, sd, f"{tp}.{j}.0", flax_prefix + ("depthwise",))
    _import_bn(params, stats, sd, f"{tp}.{j}.1", flax_prefix + ("depthwise_bn",))
    j += 1
    if blk.use_se:
        _import_conv(params, sd, f"{tp}.{j}.fc1", flax_prefix + ("se", "fc1"))
        _import_conv(params, sd, f"{tp}.{j}.fc2", flax_prefix + ("se", "fc2"))
        j += 1
    _import_conv(params, sd, f"{tp}.{j}.0", flax_prefix + ("project",))
    _import_bn(params, stats, sd, f"{tp}.{j}.1", flax_prefix + ("project_bn",))


def convert_mnv3_state_dict(sd: Mapping[str, Any], config: BranchyConfig):
    """torchvision ``deeplabv3_mobilenet_v3_large`` state dict -> partial
    flax variables (stem = ``backbone.0``, blocks = ``backbone.{1..16}`` via
    IntermediateLayerGetter string indices, classifier = DeepLabHead)."""
    from ee_semantic_segmentation_tpu.models.mobilenetv3 import mobilenet_v3_block_specs

    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    _import_conv(params, sd, "backbone.0.0", ("stem", "conv"))
    _import_bn(params, stats, sd, "backbone.0.1", ("stem", "bn"))

    spec = mobilenet_v3_block_specs()
    for i, blk in enumerate(spec.blocks):
        _import_mnv3_block(params, stats, sd, f"backbone.{i + 1}", (f"block_{i}",), blk)

    if "classifier.0.convs.0.0.weight" in sd:
        _import_deeplab_head(params, stats, sd, "classifier", ("classifier",))
    return {"params": params, "batch_stats": stats}


def convert_state_dict(sd: Mapping[str, Any], config: BranchyConfig):
    """torchvision deeplabv3 state dict -> partial flax variables.

    Returns ``{'params': tree, 'batch_stats': tree}`` covering stem, all
    trunk blocks and the main classifier.  Merge over a freshly initialized
    variable tree with :func:`merge_variables`.  Dispatches on the config's
    backbone (resnet / mobilenet_v3_large, from_deepv3_new.py:41-54).
    """
    if config.backbone == "mobilenet_v3_large":
        return convert_mnv3_state_dict(sd, config)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    _import_conv(params, sd, "backbone.conv1", ("stem", "conv1"))
    _import_bn(params, stats, sd, "backbone.bn1", ("stem", "bn1"))

    spec = resnet_block_specs(config.backbone_depth)
    for i, blk in enumerate(spec.blocks):
        stage, idx = re.match(r"layer(\d+)\.(\d+)", blk.name).groups()
        tp = f"backbone.layer{stage}.{idx}"
        fp = (f"block_{i}",)
        for c in ("conv1", "conv2", "conv3"):
            _import_conv(params, sd, f"{tp}.{c}", fp + (c,))
        for b in ("bn1", "bn2", "bn3"):
            _import_bn(params, stats, sd, f"{tp}.{b}", fp + (b,))
        if blk.downsample:
            _import_conv(params, sd, f"{tp}.downsample.0", fp + ("downsample_conv",))
            _import_bn(params, stats, sd, f"{tp}.downsample.1", fp + ("downsample_bn",))

    if "classifier.0.convs.0.0.weight" in sd:
        _import_deeplab_head(params, stats, sd, "classifier", ("classifier",))
    return {"params": params, "batch_stats": stats}


def merge_variables(init_vars: Mapping, imported: Mapping):
    """Overlay imported leaves onto a freshly initialized variable tree.

    Raises on shape mismatch; leaves not covered by the import (branch heads)
    keep their initialization.
    """
    import jax

    def overlay(dst, src, path=()):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"imported key not in model tree: {'/'.join(path + (k,))}")
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, path + (k,))
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: "
                        f"model {dst[k].shape} vs import {v.shape}"
                    )
                out[k] = jax.numpy.asarray(v, dst[k].dtype)
        return out

    merged = dict(init_vars)
    for col in imported:
        merged[col] = overlay(init_vars[col], imported[col])
    return merged


def load_torch_checkpoint(path: str):
    """Load a ``.pth`` file on CPU and pull out a usable state dict.

    Handles both plain ``state_dict`` saves and the reference's training
    checkpoints (``{'model_state_dict': ...}``, train_funcs.py:208-216).
    Whole-module pickles (``tch.save(net, ...)``, deepv3_funcs.py:188) can't
    be unpickled without the original class definitions; users should export
    ``net.state_dict()`` from the reference environment instead.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    if isinstance(obj, dict) and "model_state_dict" in obj:
        return obj["model_state_dict"]
    return obj
