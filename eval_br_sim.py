#!/usr/bin/env python3
"""Reference-compatible entry point: delegates to
ee_semantic_segmentation_tpu.cli.eval_br_sim (same flags as the reference's
eval_br_sim.py)."""

from ee_semantic_segmentation_tpu.cli.eval_br_sim import main

if __name__ == "__main__":
    main()
