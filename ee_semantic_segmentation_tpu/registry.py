"""String -> object registries (config surface).

Mirrors /root/reference/module_variables.py's lookup maps (``seg_losses``
:49-67, ``get_loss`` :69-78, ``get_metric`` :95-121, ``get_initializer``
:123-133) with factories instead of shared singleton instances — the
reference's registry handed the *same* loss object to every experiment,
which is state-leak-prone; factories are free of that.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.ops import branchy as BSL
from ee_semantic_segmentation_tpu.ops import losses as SL
from ee_semantic_segmentation_tpu.ops import metrics as SM
from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss, cross_entropy

# ------------------------------------------------------------------- losses
seg_losses: dict[str, Callable] = {
    "FocalLoss": lambda: SL.FocalLoss(),
    "FocalLoss_sum": lambda: SL.FocalLoss(reduction="sum"),
    "JaccardLoss": lambda: SL.JaccardLoss(),
    "JaccardLoss_sum": lambda: SL.JaccardLoss(reduction="sum"),
    "JaccardLoss_sum_dg": lambda: SL.JaccardLoss(reduction="sum", downgrad_bg=0.05),
    "TverskyLoss": lambda: SL.TverskyLoss(alpha=0.7, beta=0.3),
    "TverskyLoss_sum": lambda: SL.TverskyLoss(alpha=0.7, beta=0.3, reduction="sum"),
    "FocalTverskyLoss": lambda: SL.FocalTverskyLoss(alpha=0.7, beta=0.3, gamma=4 / 3),
    "FocalTverskyLoss_sum": lambda: SL.FocalTverskyLoss(alpha=0.7, beta=0.3, gamma=4 / 3, reduction="sum"),
    "HybridFocal": lambda: SL.HybridFocalLoss(),
    "LovaszSoftmax": lambda: SL.LovaszSoftmax(ignore=21),
    "LovaszSoftmax_ignore": lambda: SL.LovaszSoftmax(ignore=0),
    "BSL_Focal": lambda: BSL.FocalLoss(n_branches=4),
    "BSL_Jaccard": lambda: BSL.JaccardLoss(n_branches=4),
    "BSL_Tversky": lambda: BSL.TverskyLoss(alpha=0.7, beta=0.3, n_branches=4),
    "BSL_FocalTversky": lambda: BSL.FocalTverskyLoss(alpha=0.7, beta=0.3, gamma=4 / 3, n_branches=4),
    "BSL_Lovasz": lambda: BSL.LovaszSoftmax(classes="present", ignore=21),
    "BrXEntropy": lambda: BrXEntropyLoss(ignore_index=21, b_reduction="sum"),
}


def _mse(y_pred, y):
    return jnp.mean((y_pred - y) ** 2)


def _l1(y_pred, y):
    return jnp.mean(jnp.abs(y_pred - y))


def _smooth_l1(y_pred, y, beta: float = 1.0):
    d = jnp.abs(y_pred - y)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


get_loss: dict[str, Callable] = {
    "MSE": lambda: _mse,
    "MSE_sum": lambda: (lambda p, y: jnp.sum((p - y) ** 2)),
    "L1": lambda: _l1,
    "S_L1": lambda: _smooth_l1,
    "x_entropy": lambda: (lambda p, y: cross_entropy(p, y)),
    "x_entropy_sum": lambda: (lambda p, y: cross_entropy(p, y, reduction="sum")),
    "nll": lambda: (
        # select_class, not take_along_axis: gather-free VJP (ops/losses.py)
        lambda p, y: -jnp.mean(
            SL.select_class(p, jnp.clip(y.astype(jnp.int32), 0, p.shape[-1] - 1))
        )
    ),
    **seg_losses,
}

# ------------------------------------------------------------------ metrics
get_metric: dict[str, Callable] = {
    "F1": lambda: SM.F_beta(),
    "F2": lambda: SM.F_beta(beta=2),
    "F.5": lambda: SM.F_beta(beta=0.5),
    "Dice": lambda: SL.DiceLoss(index=True),
    "Jaccard": lambda: SL.JaccardLoss(index=True),
    "mIoU": lambda: SM.mIoU,  # evaluator class (module_variables.py:112)
    "accuracy": lambda: SM.Accuracy(),
    "precision": lambda: SM.Precision(),
    "recall": lambda: SM.Recall(),
    **seg_losses,
}

# ------------------------------------------------------- model constructors
def _net_consts():
    """Name -> model class (module_variables.py:39-46 ``net_consts``; the
    reference's U-Net/AE source files are missing from its snapshot — these
    resolve to the reconstructed family in models/unet.py)."""
    from ee_semantic_segmentation_tpu.models.unet import AE, BranchyUNet, UNet

    return {
        "UNet": UNet,
        "EUNet": BranchyUNet,
        "AE": AE,
        "branchy_unet": BranchyUNet,
    }


# ------------------------------------------------------------- initializers
get_initializer: dict[str, Callable] = {
    "xavier_u": jax.nn.initializers.glorot_uniform,
    "xavier_n": jax.nn.initializers.glorot_normal,
    "normal": jax.nn.initializers.normal,
    "uniform": jax.nn.initializers.uniform,
    "ones": lambda: jax.nn.initializers.ones,
    "orthogonal": jax.nn.initializers.orthogonal,
    "kaiming_uniform": jax.nn.initializers.he_uniform,
    "kaiming_normal": jax.nn.initializers.he_normal,
    "dirac": jax.nn.initializers.delta_orthogonal,
}

act_funcs = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "selu": jax.nn.selu,
    "leaky relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "mish": jax.nn.mish,
}


# --------------------------------------------------------------- conv blocks
def _conv_blks():
    """Name -> block class (module_variables.py:26-32 ``conv_blks``; the
    upstream ``conv_blocks`` module is missing from the snapshot — these
    are the clean-room reconstructions in models/conv_blocks.py)."""
    from ee_semantic_segmentation_tpu.models import conv_blocks as CB

    return {
        "InvertedResidual": CB.InvertedResidualBlk,
        "InceptionBlk": CB.InceptionBlk,
        "CIncepBlk": CB.CIncepBlk,
        "HDConvBlk": CB.HDConvBlk,
        "WaveBlk": CB.WaveBlk,
    }


def _get_mod():
    """Name -> layer/block class (module_variables.py:34-37 ``get_mod``)."""
    from ee_semantic_segmentation_tpu.models.layers import ConvLayer, DenseLayer

    return {"DenseLayer": DenseLayer, "ConvLayer": ConvLayer, **_conv_blks()}


def _conv_nd(rank: int):
    import flax.linen as nn

    def make(features, kernel_size=3, **kw):
        ks = (kernel_size,) * rank if isinstance(kernel_size, int) else kernel_size
        return nn.Conv(features, ks, **kw)

    return make


# name -> rank-n flax Conv factory (module_variables.py:135-139 ``get_conv``;
# flax's nn.Conv is rank-agnostic, so these fix the kernel rank)
get_conv: dict[str, Callable] = {
    "1d": _conv_nd(1),
    "2d": _conv_nd(2),
    "3d": _conv_nd(3),
}
