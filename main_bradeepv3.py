#!/usr/bin/env python3
"""Reference-compatible entry point: delegates to
ee_semantic_segmentation_tpu.cli.main_bradeepv3 (same flags as the reference's
main_bradeepv3.py)."""

from ee_semantic_segmentation_tpu.cli.main_bradeepv3 import main

if __name__ == "__main__":
    main()
