#!/usr/bin/env python3
"""Probe: does the v5e MXU's int8 path (s8 x s8 -> s32) beat bf16 on the
flagship's hot conv shapes?

v5e peak is ~394 TOPS int8 vs ~197 TFLOPs bf16 -- IF XLA lowers
s8 convolutions to the MXU's int8 mode.  This measures representative
convs from the 512-square flagship (layer4 3x3 d2, head 1x1, ASPP 3x3
d12) with the chained-loop single-scalar-fetch method (the only honest
timing through the axon tunnel, see CLAUDE.md).

A >= 1.5x win here justifies building an opt-in post-training-quantized
serving path; ~1x means XLA doesn't use the int8 MXU mode and the idea
dies cheaply.

Usage: python tools/bench_int8_probe.py [--batch 32] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    N = args.batch
    # (name, in_shape HWC, kernel HWIO, dilation)
    cases = [
        ("layer4_3x3_d2", (64, 64, 512), (3, 3, 512, 512), (2, 2)),
        ("head_1x1", (64, 64, 1024), (1, 1, 1024, 256), (1, 1)),
        ("aspp_3x3_d12", (64, 64, 256), (3, 3, 256, 256), (12, 12)),
        ("layer3_3x3_d1", (64, 64, 256), (3, 3, 256, 256), (1, 1)),
    ]
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    rng = np.random.RandomState(0)
    rows = []
    for name, (h, w, cin), kshape, dil in cases:
        pad = ((kshape[0] // 2) * dil[0], (kshape[1] // 2) * dil[1])
        padding = ((pad[0], pad[0]), (pad[1], pad[1]))
        xf = rng.rand(N, h, w, cin).astype(np.float32) - 0.5
        kf = rng.rand(*kshape).astype(np.float32) - 0.5
        xi = (xf * 127).astype(np.int8)
        ki = (kf * 127).astype(np.int8)

        def conv(x, k, prefer):
            return lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=padding,
                rhs_dilation=dil, dimension_numbers=dn,
                preferred_element_type=prefer)

        def timed(x, k, prefer, integer):
            x = jnp.asarray(x)
            k = jnp.asarray(k)

            @jax.jit
            def loop(x, k, n):
                # iterations must be data-chained or XLA DCEs the conv
                # (first version multiplied by 0 and "measured" 287 TMAC/s,
                # 3x the bf16 peak — pure loop overhead)
                if integer:
                    def body(i, carry):
                        y = conv(x + carry.astype(x.dtype), k, prefer)
                        return jnp.sum(y) & 1  # data-dependent 0/1, unfoldable

                    return lax.fori_loop(0, n, body, jnp.int32(0))

                def body(i, carry):
                    y = conv(x + carry.astype(x.dtype) * 1e-12, k, prefer)
                    return jnp.sum(y.astype(jnp.float32)) * 1e-12

                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            float(loop(x, k, 1))
            t0 = time.perf_counter()
            v = float(loop(x, k, args.iters))
            assert np.isfinite(v)
            return (time.perf_counter() - t0) / args.iters * 1e3

        t_bf16 = timed(xf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
                       jnp.float32, False)
        print(f"{name}: bf16 {t_bf16:.3f} ms", flush=True)
        try:
            t_int8 = timed(xi, ki, jnp.int32, True)
        except Exception as e:  # noqa: BLE001 - probe must report, not die
            print(f"{name}: int8 conv failed: {type(e).__name__}: {e}", flush=True)
            t_int8 = float("nan")
        print(f"{name}: int8 {t_int8:.3f} ms", flush=True)
        macs = N * h * w * kshape[0] * kshape[1] * kshape[2] * kshape[3]
        rows.append((name, t_bf16, t_int8, macs))

    print(f"{'case':>16} {'bf16 ms':>9} {'int8 ms':>9} {'speedup':>8} "
          f"{'bf16 TMAC/s':>12} {'int8 TMAC/s':>12}")
    for name, tb, ti, macs in rows:
        print(f"{name:>16} {tb:9.3f} {ti:9.3f} {tb / ti:8.2f} "
              f"{macs / tb / 1e9:12.1f} {macs / ti / 1e9:12.1f}")


if __name__ == "__main__":
    main()
