"""Sequential early-exit engine CLI, normalized-entropy gate -> CSV.

Mirrors /root/reference/ee_dnn_op_ne.py:110-213: gate = image mean
normalized entropy of the exit softmax < threshold (with optional max/min
block pooling — and unlike the reference, the pool-size flag actually works;
its ``s=size`` NameError is SURVEY.md bug #11).  CSV schema: exit histogram,
avg_flops, edge_flops, mIoU (no ``_2`` columns, matching the reference).
"""

from __future__ import annotations

from ee_semantic_segmentation_tpu.cli.ee_dnn_op import build_parser, run


def main(argv=None):
    args = build_parser(entropy=True).parse_args(argv)
    if args.metric is None:
        args.metric = "ent"
    assert args.metric.lower() in ("ent", "max", "min")
    run(args, entropy=True)


if __name__ == "__main__":
    main()
