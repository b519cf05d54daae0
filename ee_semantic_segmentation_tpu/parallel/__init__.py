"""Device mesh, shardings, and pjit train/eval steps.

The reference is strictly single-GPU (SURVEY.md §2: no torch.distributed,
``nn.DataParallel`` commented out, /root/reference/train_funcs.py:72-74).
This package is the TPU-native scaling layer it lacks: a 1-D ``('data',)``
mesh over ICI, batch sharded on the data axis, parameters replicated,
gradient ``psum`` inserted automatically by GSPMD through sharded autodiff.
BatchNorm statistics are computed over the *global* batch (the batch axis is
sharded, so XLA turns the BN mean/variance reductions into cross-chip
collectives) — synced BN for free.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
shard the input pipeline per host with ``process_index``.
"""

from ee_semantic_segmentation_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)
from ee_semantic_segmentation_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
