"""Pallas TPU kernels for the gating/eval hot path.

XLA already fuses the conv/BN/ReLU compute path well; these kernels target
the ops where XLA materializes large intermediates in HBM:

* ``entropy_kernel`` — fused softmax + normalized entropy + spatial mean:
  streams logits tiles through VMEM and writes one scalar per image,
  instead of materializing the (N, H, W, C) softmax probabilities.
* ``confusion_kernel`` — fused argmax + per-class TP/FP/FN accumulation:
  streams pixel tiles and keeps the (3, C) counts in VMEM, instead of
  materializing two (P, C) one-hot matrices.
* ``upsample_argmax`` — fused bilinear-upsample (as two exact weight-matrix
  matmuls per class) + argmax: writes (N, H, W) int32 label maps without
  ever materializing the upsampled (N, H, W, C) float32 logits.

Each kernel has a reference jnp implementation it is tested against
(``interpret=True`` on CPU; compiled on TPU).
"""

from ee_semantic_segmentation_tpu.ops.pallas.entropy_kernel import (
    batched_entropy_pallas,
)
from ee_semantic_segmentation_tpu.ops.pallas.confusion_kernel import (
    confusion_pallas,
)
from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
    upsample_argmax,
)
