"""Numeric parity: flax modules with imported torch weights must match a
torch functional-ops reference chain (same weights, eval mode).

This validates both the weight converter (models/import_torch.py) and the
module implementations (resnet.Bottleneck, aspp.DeepLabHead) against
torchvision's architecture semantics — without torchvision (not installed):
the torch side is reproduced with bare ``torch.nn.functional`` calls.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.models.resnet import BlockSpec, Bottleneck
from ee_semantic_segmentation_tpu.models.aspp import DeepLabHead
from ee_semantic_segmentation_tpu.models import import_torch as IT

EPS = 1e-5


def _rand_sd(shapes, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in shapes.items():
        if name.endswith("running_var"):
            sd[name] = torch.from_numpy(rng.rand(*shape).astype(np.float32) + 0.5)
        else:
            sd[name] = torch.from_numpy((rng.randn(*shape) * 0.1).astype(np.float32))
    return sd


def _bn(x, sd, p):
    return TF.batch_norm(
        x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
        sd[f"{p}.weight"], sd[f"{p}.bias"], False, 0.0, EPS,
    )


def torch_bottleneck(x, sd, spec: BlockSpec):
    out = TF.conv2d(x, sd["conv1.weight"])
    out = TF.relu(_bn(out, sd, "bn1"))
    out = TF.conv2d(
        out, sd["conv2.weight"], stride=spec.stride,
        padding=spec.dilation, dilation=spec.dilation,
    )
    out = TF.relu(_bn(out, sd, "bn2"))
    out = TF.conv2d(out, sd["conv3.weight"])
    out = _bn(out, sd, "bn3")
    if spec.downsample:
        idn = TF.conv2d(x, sd["downsample.0.weight"], stride=spec.stride)
        idn = _bn(idn, sd, "downsample.1")
    else:
        idn = x
    return TF.relu(out + idn)


@pytest.mark.parametrize(
    "spec",
    [
        BlockSpec("layer1.0", 16, 8, 32, 1, 1, True),
        BlockSpec("layer2.0", 32, 8, 32, 2, 1, True),
        BlockSpec("layer3.1", 32, 8, 32, 1, 2, False),
    ],
)
def test_bottleneck_parity(spec):
    shapes = {
        "conv1.weight": (spec.width, spec.cin, 1, 1),
        "conv2.weight": (spec.width, spec.width, 3, 3),
        "conv3.weight": (spec.cout, spec.width, 1, 1),
    }
    for b in ("bn1", "bn2"):
        for s in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{b}.{s}"] = (spec.width,)
    for s in ("weight", "bias", "running_mean", "running_var"):
        shapes[f"bn3.{s}"] = (spec.cout,)
    if spec.downsample:
        shapes["downsample.0.weight"] = (spec.cout, spec.cin, 1, 1)
        for s in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"downsample.1.{s}"] = (spec.cout,)
    sd = _rand_sd(shapes)

    x = np.random.RandomState(1).randn(2, spec.cin, 10, 10).astype(np.float32)
    ref = torch_bottleneck(torch.from_numpy(x), sd, spec).numpy()

    # convert into the flax module
    model = Bottleneck(spec)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    params, stats = {}, {}
    for c in ("conv1", "conv2", "conv3"):
        IT._import_conv(params, sd, c, (c,))
    for b in ("bn1", "bn2", "bn3"):
        IT._import_bn(params, stats, sd, b, (b,))
    if spec.downsample:
        IT._import_conv(params, sd, "downsample.0", ("downsample_conv",))
        IT._import_bn(params, stats, sd, "downsample.1", ("downsample_bn",))
    merged = IT.merge_variables(variables, {"params": params, "batch_stats": stats})
    out = model.apply(merged, x_nhwc, train=False)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-4, atol=1e-4)


def torch_deeplab_head(x, sd, rates=(2, 4, 6), mid=8, classes=3):
    branches = []
    b = TF.conv2d(x, sd["classifier.0.convs.0.0.weight"])
    branches.append(TF.relu(_bn(b, sd, "classifier.0.convs.0.1")))
    for i, r in enumerate(rates, start=1):
        b = TF.conv2d(x, sd[f"classifier.0.convs.{i}.0.weight"], padding=r, dilation=r)
        branches.append(TF.relu(_bn(b, sd, f"classifier.0.convs.{i}.1")))
    g = TF.adaptive_avg_pool2d(x, 1)
    g = TF.conv2d(g, sd["classifier.0.convs.4.1.weight"])
    g = TF.relu(_bn(g, sd, "classifier.0.convs.4.2"))
    g = TF.interpolate(g, size=x.shape[-2:], mode="bilinear", align_corners=False)
    branches.append(g)
    y = torch.cat(branches, dim=1)
    y = TF.conv2d(y, sd["classifier.0.project.0.weight"])
    y = TF.relu(_bn(y, sd, "classifier.0.project.1"))
    y = TF.conv2d(y, sd["classifier.1.weight"], padding=1)
    y = TF.relu(_bn(y, sd, "classifier.2"))
    return TF.conv2d(y, sd["classifier.4.weight"], sd["classifier.4.bias"])


def test_deeplab_head_parity():
    cin, mid, classes = 16, 8, 3
    rates = (2, 4, 6)
    shapes = {
        "classifier.0.convs.0.0.weight": (mid, cin, 1, 1),
        "classifier.0.convs.4.1.weight": (mid, cin, 1, 1),
        "classifier.0.project.0.weight": (mid, mid * 5, 1, 1),
        "classifier.1.weight": (mid, mid, 3, 3),
        "classifier.4.weight": (classes, mid, 1, 1),
        "classifier.4.bias": (classes,),
    }
    for i in range(1, 4):
        shapes[f"classifier.0.convs.{i}.0.weight"] = (mid, cin, 3, 3)
    for bn_name in (
        "classifier.0.convs.0.1", "classifier.0.convs.1.1", "classifier.0.convs.2.1",
        "classifier.0.convs.3.1", "classifier.0.convs.4.2", "classifier.0.project.1",
        "classifier.2",
    ):
        for s in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{bn_name}.{s}"] = (mid,)
    sd = _rand_sd(shapes, seed=2)

    x = np.random.RandomState(3).randn(2, cin, 12, 12).astype(np.float32)
    ref = torch_deeplab_head(torch.from_numpy(x), sd, rates, mid, classes).numpy()

    model = DeepLabHead(num_classes=classes, mid_channels=mid, atrous_rates=rates)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    params, stats = {}, {}
    IT._import_deeplab_head(params, stats, sd, "classifier", ())
    merged = IT.merge_variables(variables, {"params": params, "batch_stats": stats})
    out = model.apply(merged, x_nhwc, train=False)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-4, atol=1e-4)
