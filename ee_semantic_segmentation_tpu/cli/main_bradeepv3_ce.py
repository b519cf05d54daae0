"""Train branchy DeepLabV3 with multi-exit pixelwise cross-entropy.

Mirrors /root/reference/main_bradeepv3_ce.py — identical to the Lovász CLI
except the loss is ``BrXEntropyLoss(ignore_index=21, b_reduction='sum',
n_exits=n_branches+1)`` (main_bradeepv3_ce.py:121).
"""

from __future__ import annotations


def main(argv=None):
    from ee_semantic_segmentation_tpu.cli.main_bradeepv3 import build_parser, make_dts_info
    from ee_semantic_segmentation_tpu.data.loader import dataset_class_info
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.train.trainer import eval_deepv3
    from ee_semantic_segmentation_tpu.utils.logging import log_msg

    args = build_parser().parse_args(argv)
    _, void = dataset_class_info(args.dataset)
    loss = BrXEntropyLoss(ignore_index=void, b_reduction="sum", n_exits=args.n_branches + 1)
    info = make_dts_info(args, loss)
    ret = eval_deepv3(info)
    log_msg(f"Finished training. model is saved @ {ret}", info["use_file"], True)
    log_msg("-" * 20, info["use_file"], True)
    return ret


if __name__ == "__main__":
    main()
