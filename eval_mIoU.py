#!/usr/bin/env python3
"""Reference-compatible entry point: delegates to
ee_semantic_segmentation_tpu.cli.eval_miou (same flags as the reference's
eval_mIoU.py)."""

from ee_semantic_segmentation_tpu.cli.eval_miou import main

if __name__ == "__main__":
    main()
