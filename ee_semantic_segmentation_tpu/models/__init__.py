"""Flax model zoo: dilated backbones, ASPP heads, branchy segmenters.

All modules are channels-last (NHWC), statically shaped, and carry analytic
FLOPs metadata so branch placement and per-exit cost tables never need probe
forwards (unlike the reference's pthflops runs,
/root/reference/from_deepv3_new.py:99-115).
"""

from ee_semantic_segmentation_tpu.models.aspp import ASPP, DeepLabHead, BranchHead
from ee_semantic_segmentation_tpu.models.resnet import (
    ResNetStem,
    Bottleneck,
    resnet_block_specs,
    BackboneSpec,
    BlockSpec,
)
from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
    BranchyConfig,
    BranchyDeepLabV3,
    build_branchy_deeplabv3,
    place_branches,
)
from ee_semantic_segmentation_tpu.models.unet import AE, BranchyUNet, UNet
from ee_semantic_segmentation_tpu.models.mobilenetv3 import mobilenet_v3_block_specs
