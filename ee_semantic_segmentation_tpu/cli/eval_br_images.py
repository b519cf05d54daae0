"""Similarity-gated policy evaluation with per-image mIoU accumulators.

Mirrors /root/reference/eval_br_images.py — identical to eval_br_sim except
accumulators are ``img_mIoU`` (eval_br_images.py:17)."""

from ee_semantic_segmentation_tpu.cli.eval_br_sim import main as _main


def main(argv=None):
    return _main(argv, image_level=True)


if __name__ == "__main__":
    main()
