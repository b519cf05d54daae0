"""Device mesh, shardings, and pjit train/eval steps.

The reference is strictly single-GPU (SURVEY.md §2: no torch.distributed,
``nn.DataParallel`` commented out, /root/reference/train_funcs.py:72-74).
This package is the TPU-native scaling layer it lacks: a 1-D ``('data',)``
mesh over ICI, batch sharded on the data axis, parameters replicated,
gradient ``psum`` inserted automatically by GSPMD through sharded autodiff.
BatchNorm statistics are computed over the *global* batch (the batch axis is
sharded, so XLA turns the BN mean/variance reductions into cross-chip
collectives) — synced BN for free.

``make_mesh_2d(dp, sp)`` adds spatial partitioning on top: image height is
sharded over the 'space' axis (PartitionSpec('data', 'space') on NHWC) and
GSPMD inserts the conv/pool halo exchanges at shard edges.  This is the
TPU answer to activation-bound full-res training (2048x1024 Cityscapes):
per-device activation memory scales 1/(dp*sp) while the params stay
replicated, and the same jitted step runs on any (dp, sp) factorization.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
shard the input pipeline per host with ``process_index``.
"""

from ee_semantic_segmentation_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    shard_batch,
    replicate,
    data_sharding,
    batch_space_sharding,
    replicated_sharding,
    space_size,
)
from ee_semantic_segmentation_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
