"""Training engine: SGD param groups, schedulers, early-stopping trainer,
Orbax checkpointing, message-file + CSV logging."""

from ee_semantic_segmentation_tpu.train.optim import (
    sgd_momentum,
    branchy_lr_multipliers,
    label_params,
)
from ee_semantic_segmentation_tpu.train.schedulers import (
    PolynomialLR,
    ReduceLROnPlateau,
)
from ee_semantic_segmentation_tpu.train.trainer import train, train_deepv3, eval_deepv3
