"""Pure-JAX numerics: losses, metrics, and early-exit gating functions.

Everything here is functional, statically shaped, and jit/vmap/pjit safe.
Dynamic-shaped constructs from the PyTorch reference (boolean indexing of
void pixels, per-image ``unique`` calls) are re-expressed as fixed-shape
masked computations so they compile onto the TPU.
"""

from ee_semantic_segmentation_tpu.ops.lovasz import (
    lovasz_grad,
    lovasz_softmax,
    lovasz_softmax_flat,
)
from ee_semantic_segmentation_tpu.ops.losses import (
    SegLoss,
    DiceLoss,
    JaccardLoss,
    TverskyLoss,
    FocalTverskyLoss,
    FocalLoss,
    HybridFocalLoss,
    LovaszSoftmax,
)
from ee_semantic_segmentation_tpu.ops.xentropy import (
    cross_entropy,
    BrXEntropyLoss,
)
from ee_semantic_segmentation_tpu.ops.metrics import (
    confusion_counts,
    mIoU,
    img_mIoU,
    Recall,
    Precision,
    F_beta,
    Accuracy,
)
