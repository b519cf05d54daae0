"""Pallas TPU kernels for the gating/eval/training hot paths.

XLA already fuses the conv/BN/ReLU compute path well; these kernels target
the ops where XLA either materializes large intermediates in HBM or
schedules poorly:

* ``upsample_argmax`` — fused bilinear-upsample (as two exact weight-matrix
  matmuls per class) + argmax: writes (N, H, W) int32 label maps without
  ever materializing the upsampled (N, H, W, C) float32 logits; the
  ``upsample_entropy_argmax`` variant also emits the per-image normalized
  softmax entropy (the eval_br_ent gate), and ``upsample_argmax_confusion``
  folds the per-class TP/FP/FN counting in too, so only a (3, C) count
  matrix leaves the kernel.
* ``sort_kernel`` — batched VMEM-resident bitonic sort (key + payload):
  the Lovász training step is sort-bound; one row fits entirely in VMEM so
  the whole network runs at register/VMEM bandwidth instead of lax.sort's
  multi-pass HBM streaming.
* ``hist_kernel`` — weighted bucket histograms + per-bucket table lookups
  as MXU one-hot contractions: the sort-FREE histogram Lovász path
  (ops/lovasz.py ``hist_bins``) needs no sort at all — O(bins) MACs per
  pixel instead of O(log^2 P) VMEM sweeps per row.

Round-1 standalone gating kernels (softmax-entropy, argmax-confusion on
full-res maps) consistently lost to XLA's own fusion (C=21 wastes 107 of
128 lanes when classes sit in the lane dim) and were retired in round 3 —
superseded by the upsample-fused variants above, where the class loop sits
OUTSIDE the lane dim and the matmuls carry the cost.

Each kernel has a reference jnp implementation it is tested against
(``interpret=True`` on CPU; compiled + compared on TPU via `make tpu-smoke`).
"""

from ee_semantic_segmentation_tpu.ops.pallas.hist_kernel import (
    hist2d_weighted,
    hist_bins_ok,
    table_lookup,
)
from ee_semantic_segmentation_tpu.ops.pallas.sort_kernel import (
    sort_pallas,
    sortable,
)
from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
    upsample_argmax,
    upsample_argmax_confusion,
    upsample_entropy_argmax,
)
