#!/usr/bin/env python3
"""Per-component forward-time breakdown for the flagship eval config.

VERDICT r02 #5 asks for either >= 320 img/s at 512² or a profiler-backed
breakdown proving the remaining gap is MXU-bound.  jax.profiler device
traces do not survive the axon tunnel, so this measures each component as
its own chained-loop program (iterations chained inside one XLA program,
one scalar fetched — the only timing method that is honest through the
tunnel, see CLAUDE.md) and compares its time share against its analytic
FLOPs share:

  time_share >> flops_share  -> the component wastes MXU cycles (layout,
                                 low arithmetic intensity, VPU-bound);
  time_share ~= flops_share  -> running at the program's average efficiency.

Usage: python tools/bench_breakdown.py [--img 512] [--batch 32] [--iters 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, nargs="+", default=[512])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--branches", type=int, default=2)
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem conv (exact rewrite)")
    ap.add_argument("--only", default=None,
                    help="comma-separated component filter (e.g. stem,layer1)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.models import aspp as heads
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        backbone_spec,
        build_branchy_deeplabv3,
    )

    dims = args.img if len(args.img) > 1 else args.img[0]
    model = build_branchy_deeplabv3(
        depth=args.depth, n=args.branches, img_dim=dims,
        count_branches=False, dtype=jnp.bfloat16,
    )
    if args.s2d:
        model = model.clone(stem_s2d=True)
    cfg = model.config
    H, W = cfg.img_hw
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    spec = backbone_spec(cfg)
    geo = spec.block_geometry(H, W)  # input (h, w, cin) per block
    ends = list(cfg.segment_ends) + [len(spec.blocks)]

    rng = np.random.RandomState(0)
    N = args.batch

    only = set(args.only.split(",")) if args.only else None

    def timeit(name, fn, x_shape, flops):
        """Chained-loop timing of fn on a random bf16 input of x_shape."""
        if only is not None and name not in only and name != "full_lowres_forward":
            return 0.0
        x = jnp.asarray(rng.rand(*x_shape), jnp.bfloat16)

        @jax.jit
        def loop(v, x, n):
            def body(i, carry):
                y = fn(v, x + carry.astype(x.dtype) * 1e-12)
                return jnp.sum(y.astype(jnp.float32)) * 1e-12

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(variables, x, 1))  # compile + warm
        t0 = time.perf_counter()
        v = float(loop(variables, x, args.iters))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(v)
        results.append({"component": name, "ms": round(dt * 1e3, 3),
                        "gflops_per_img": round(flops / 1e9, 2)})
        return dt

    results = []

    # --- stem
    timeit("stem", lambda v, x: model.apply(v, x, method=lambda m, x: m.stem(x, train=False)),
           (N, H, W, 3), spec.stem_flops(H, W))

    # --- trunk stages (layer1..layer4) on their true input geometries
    stages = {}
    for i, blk in enumerate(spec.blocks):
        stages.setdefault(blk.name.split(".")[0], []).append(i)
    sh, sw, _ = spec.stem_out(H, W)
    for stage, idxs in stages.items():
        h, w, cin = geo[idxs[0]]
        fl = sum(spec.blocks[i].flops(*geo[i][:2]) for i in idxs)

        def run_blocks(v, x, idxs=tuple(idxs)):
            def f(m, x):
                for i in idxs:
                    x = m.blocks[i](x, False)
                return x
            return model.apply(v, x, method=f)

        timeit(stage, run_blocks, (N, h, w, cin), fl)

    # --- heads at their true feature geometries
    for k in range(cfg.n_branches):
        e = cfg.segment_ends[k]
        h, w, _ = spec.blocks[e - 1].out_shape(*geo[e - 1][:2])
        cin = spec.blocks[e - 1].cout
        fl = heads.deeplab_head_flops(h, w, cin, num_classes=cfg.num_classes)

        def run_branch(v, x, k=k):
            return model.apply(v, x, method=lambda m, x: m.branches[k](x, train=False))

        timeit(f"branch_{k}", run_branch, (N, h, w, cin), fl)
    fh, fw, _ = spec.blocks[-1].out_shape(*geo[-1][:2])
    fl = heads.deeplab_head_flops(fh, fw, spec.blocks[-1].cout,
                                  num_classes=cfg.num_classes, mid=cfg.classifier_mid)
    timeit("classifier",
           lambda v, x: model.apply(v, x, method=lambda m, x: m.classifier(x, train=False)),
           (N, fh, fw, spec.blocks[-1].cout), fl)

    # --- full-res upsample of one exit's logits (jnp bilinear, f32)
    up_flops = 0  # not MXU work; report time only
    timeit("upsample_1exit",
           lambda v, x: jax.image.resize(x.astype(jnp.float32), (N, H, W, cfg.num_classes), "bilinear"),
           (N, fh, fw, cfg.num_classes), up_flops)

    # --- full lowres forward (everything except upsamples)
    total_fl = spec.cumulative_flops(H, W)[-1] + sum(
        heads.deeplab_head_flops(fh, fw, c, num_classes=cfg.num_classes)
        for c in cfg.branch_channels
    ) + fl

    def full(v, x):
        ys = model.apply(v, x, method=lambda m, x: m.lowres_logits(x, train=False))
        return sum(jnp.sum(y.astype(jnp.float32)) for y in ys)

    timeit("full_lowres_forward", full, (N, H, W, 3), total_fl)

    full = next(r for r in results if r["component"] == "full_lowres_forward")
    t_full = full["ms"]
    parts = [r for r in results
             if r["component"] not in ("full_lowres_forward", "upsample_1exit")]
    t_parts = sum(r["ms"] for r in parts)
    fl_total = sum(r["gflops_per_img"] for r in parts) or full["gflops_per_img"]
    # flops.py counts MACs (1 MAC = 2 FLOPs); v5e bf16 peak 197 TFLOPs/s
    # = 98.5 TMAC/s, so mxu_frac below is a true fraction of MXU peak.
    peak_tflops = 98.5
    for r in results:
        share_t = r["ms"] / t_full
        share_f = r["gflops_per_img"] / fl_total if fl_total else 0.0
        eff = (r["gflops_per_img"] * N / 1e3) / (r["ms"] / 1e3) / peak_tflops if r["ms"] else 0.0
        r.update(time_share=round(share_t, 3), flops_share=round(share_f, 3),
                 mxu_frac=round(eff, 3))
        print(json.dumps(r), flush=True)
    print(json.dumps({"component": "sum_of_parts", "ms": round(t_parts, 3),
                      "full_ms": t_full,
                      "img_per_s": round(N / (t_full / 1e3), 1)}), flush=True)


if __name__ == "__main__":
    main()
