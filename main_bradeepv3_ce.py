#!/usr/bin/env python3
"""Reference-compatible entry point: delegates to
ee_semantic_segmentation_tpu.cli.main_bradeepv3_ce (same flags as the reference's
main_bradeepv3_ce.py)."""

from ee_semantic_segmentation_tpu.cli.main_bradeepv3_ce import main

if __name__ == "__main__":
    main()
