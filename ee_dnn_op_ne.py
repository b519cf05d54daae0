#!/usr/bin/env python3
"""Reference-compatible entry point: delegates to
ee_semantic_segmentation_tpu.cli.ee_dnn_op_ne (same flags as the reference's
ee_dnn_op_ne.py)."""

from ee_semantic_segmentation_tpu.cli.ee_dnn_op_ne import main

if __name__ == "__main__":
    main()
