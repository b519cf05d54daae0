#!/usr/bin/env python3
"""Reference-compatible entry point: delegates to
ee_semantic_segmentation_tpu.cli.eval_image (same flags as the reference's
eval_image.py)."""

from ee_semantic_segmentation_tpu.cli.eval_image import main

if __name__ == "__main__":
    main()
