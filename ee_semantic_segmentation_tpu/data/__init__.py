"""Host-side input pipeline: decode/augment in numpy/PIL, fixed shapes out.

Mirrors the reference's torchvision pipeline (/root/reference/
get_seg_datasets.py): Resize -> CenterCrop -> normalize, p=0.2 {color jitter
| salt & pepper} train augmentation, target label maps with the VOC void
remap 255 -> 21.  Batches come out as statically shaped numpy arrays ready
for ``jax.device_put`` with a data-parallel sharding; a background-thread
prefetcher overlaps host decode with device compute.
"""

from ee_semantic_segmentation_tpu.data.transforms import (
    SegTransform,
    TargetTransform,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from ee_semantic_segmentation_tpu.data.voc import VOCSegmentation, load_voc_seg
from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset
from ee_semantic_segmentation_tpu.data.loader import DataLoader, LoadDataset
