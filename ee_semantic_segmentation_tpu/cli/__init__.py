"""Mirrored command-line entry points.

Each module here reproduces one of the reference's CLI scripts — same flag
names, same output CSV schemas — over the TPU-native stack:

    main_bradeepv3     train branchy DeepLabV3 with multi-exit Lovász
    main_bradeepv3_ce  ... with multi-exit pixelwise cross-entropy
    eval_miou          per-exit test mIoU of saved models -> CSV
    eval_flops         per-exit cumulative FLOPs -> CSV
    eval_br_ent        entropy-gated policy evaluation -> CSV
    eval_br_sim        similarity-gated policy evaluation -> CSV
    eval_br_images     similarity-gated with per-image mIoU -> CSV
    ee_dnn_op          sequential early-exit engine, similarity gate -> CSV
    ee_dnn_op_ne       sequential early-exit engine, entropy gate -> CSV
    eval_image         palette-PNG per-exit qualitative dumps

Thin same-named wrappers at the repo root let reference-style invocations
(``python main_bradeepv3.py -n 4 ...``) run unchanged.
"""
