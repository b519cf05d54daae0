#!/usr/bin/env python3
"""Two-process multi-host smoke: the REAL jax.distributed path end-to-end.

Spawns N worker processes on this host (CPU backend, Gloo collectives —
the same `jax.distributed.initialize` + global-mesh + per-process input
sharding code path a TPU pod uses over DCN, SURVEY §2 "TPU-native
equivalents"), then in every process:

1. `initialize_multihost(coordinator, N, pid)` — our bring-up path
   (parallel/mesh.py), global 1-D mesh over every device in the job;
2. `DataLoader(shard_by_process=True)` — each process reads a disjoint
   strided shard of the same global permutation;
3. one full DP train step (`make_train_step` over the global mesh) on the
   2-exit branchy model with `multihost_utils.host_local_array_to_global_array`
   committing each host's shard into the global batch;
4. asserts the loss is finite and BIT-IDENTICAL across processes — the
   proof that gradient all-reduce ran globally (each process feeds
   different data, so an un-synchronized step would diverge).

Usage: python tools/multihost_smoke.py [--nprocs 2] (spawner), or with
--worker <pid> --portfile <path> as the per-process entry.  Worker 0 picks
the coordinator port in-process and publishes it through the portfile.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _free_port() -> int:
    """OS-assigned free TCP port (fixed ports collide with stale coordinator
    processes when run under the full test suite — VERDICT r02 flake)."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _publish_port(portfile: str, port: int) -> None:
    """Atomic write (tmp + rename) so readers never see a partial file."""
    tmp = f"{portfile}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(port))
    os.replace(tmp, portfile)


def _await_port(portfile: str, timeout_s: float = 300.0) -> int:
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            with open(portfile) as f:
                txt = f.read().strip()
            if txt:
                return int(txt)
        except FileNotFoundError:
            pass
        time.sleep(0.05)
    raise TimeoutError(f"coordinator port never published to {portfile}")


def worker(pid: int, nprocs: int, portfile: str, devices_per_proc: int = 2):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ee_semantic_segmentation_tpu.parallel.mesh import initialize_multihost

    # De-flake (VERDICT r03 #7): worker 0 picks the coordinator port
    # IN-PROCESS, microseconds before jax.distributed binds it, and publishes
    # it atomically; the spawner-side reserve-then-release scheme left a
    # cross-process window in which the OS-assigned port could be re-taken.
    if pid == 0:
        port = _free_port()
        _publish_port(portfile, port)
    else:
        port = _await_port(portfile)

    mesh = initialize_multihost(
        coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid,
        # Generous timeouts: this host has ONE CPU core, and under the full
        # test suite 3+ python processes time-share it — the 100 s default
        # heartbeat window can starve during XLA compiles (VERDICT r02 flake,
        # still seen with the free-port fix alone).
        initialization_timeout=600,
        heartbeat_timeout_seconds=600,
    )
    assert jax.process_count() == nprocs
    assert mesh.devices.size == nprocs * devices_per_proc

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from ee_semantic_segmentation_tpu.data.loader import DataLoader
    from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.parallel import create_train_state, make_train_step
    from ee_semantic_segmentation_tpu.parallel.mesh import data_sharding
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    cfg = BranchyConfig(
        backbone_depth=0, img_dim=32, n_branches=1, segment_ends=(4,),
        branch_channels=(40,), num_classes=21, backbone="mobilenet_v3_large",
        branch_params={"nout_channels": 32, "atrous_rates": (2, 4, 6)},
        classifier_mid=32,
    )
    model = BranchyDeepLabV3(config=cfg)
    tx = sgd_momentum()

    global_batch = 8
    local_batch = global_batch // nprocs
    # per-process disjoint shard of the same global permutation
    ds = SyntheticSegDataset(size=32, n=global_batch, seed=0)
    loader = DataLoader(ds, batch_size=local_batch, shuffle=True, seed=7,
                        shard_by_process=True)
    batch = next(iter(loader))

    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, tx, rng, jnp.zeros((global_batch, 32, 32, 3)), mesh=mesh
    )
    loss_obj = BrXEntropyLoss(ignore_index=21, b_reduction="sum", n_exits=2)
    step = make_train_step(model, loss_obj, tx, mesh=mesh)

    # commit each host's local shard into the global batch array
    sh = data_sharding(mesh)
    g_images = multihost_utils.host_local_array_to_global_array(
        np.asarray(batch["image"]), mesh, sh.spec
    )
    g_labels = multihost_utils.host_local_array_to_global_array(
        np.asarray(batch["label"]), mesh, sh.spec
    )
    state, metrics = step(state, g_images, g_labels, jnp.float32(0.01))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss

    losses = multihost_utils.process_allgather(jnp.float32(loss))
    assert np.all(np.asarray(losses) == loss), (
        f"loss differs across processes: {losses}"
    )

    # ---- composed features across the REAL process boundary (VERDICT r04
    # #4/#6): dp x sp mesh x gradient accumulation x mesh-sharded fused
    # eval — what dryrun_multichip proves single-process, proven here over
    # 2 Gloo processes.
    from jax.sharding import PartitionSpec as P

    from ee_semantic_segmentation_tpu.ee.batch_eval import make_fused_miou_step_fn
    from ee_semantic_segmentation_tpu.parallel.mesh import (
        batch_space_sharding,
        make_mesh_2d,
        replicated_sharding,
    )

    # per-process input shards must be DISJOINT: fingerprint local rows and
    # allgather — any collision means two processes read the same image
    row_ids = np.asarray(
        [np.abs(r).sum(dtype=np.float64) for r in np.asarray(batch["image"])],
        np.float64,
    )
    all_ids = np.asarray(multihost_utils.process_allgather(row_ids)).ravel()
    assert len(set(all_ids.tolist())) == nprocs * local_batch, (
        f"per-process shards overlap: {all_ids}"
    )

    mesh2 = make_mesh_2d(dp=nprocs, sp=devices_per_proc)
    # fresh key: the first DP step DONATED state, and device_put had aliased
    # `rng` into it — reusing it here would Execute() a deleted buffer
    state2 = create_train_state(
        model, tx, jax.random.PRNGKey(1), jnp.zeros((global_batch, 32, 32, 3)),
        mesh=mesh2,
    )
    step2 = make_train_step(model, loss_obj, tx, mesh=mesh2, accum_steps=2)
    sp2 = batch_space_sharding(mesh2).spec  # ('data', 'space'): N x H sharded
    g2_images = multihost_utils.host_local_array_to_global_array(
        np.asarray(batch["image"]), mesh2, sp2
    )
    g2_labels = multihost_utils.host_local_array_to_global_array(
        np.asarray(batch["label"]), mesh2, sp2
    )
    state2, m2 = step2(state2, g2_images, g2_labels, jnp.float32(0.01))
    loss2 = float(m2["loss"])
    assert np.isfinite(loss2), loss2
    l2 = multihost_utils.process_allgather(jnp.float32(loss2))
    assert np.all(np.asarray(l2) == loss2), (
        f"dp x sp + accum loss differs across processes: {l2}"
    )

    # mesh-sharded fused per-exit confusion on the post-step state, checked
    # EXACTLY against an unsharded single-process eval of the same global
    # batch (counts are order-invariant integer sums, so the full batch can
    # be rebuilt host-side from the shared global permutation)
    ev = make_fused_miou_step_fn(model, 21, mesh=mesh2)
    conf = ev(state2.params, state2.batch_stats, g2_images, g2_labels,
              global_batch)
    conf = np.asarray(
        jax.jit(lambda x: x, out_shardings=replicated_sharding(mesh2))(conf)
    )

    full = next(iter(DataLoader(ds, batch_size=global_batch, shuffle=True,
                                seed=7)))
    params_h = jax.tree.map(np.asarray, state2.params)
    stats_h = jax.tree.map(np.asarray, state2.batch_stats)
    ref_step = make_fused_miou_step_fn(model, 21)
    ref_conf = np.asarray(ref_step(
        params_h, stats_h, jnp.asarray(full["image"]),
        jnp.asarray(full["label"]), global_batch))
    assert np.array_equal(conf, ref_conf), (
        "mesh-sharded fused eval != single-process eval:\n"
        f"{conf}\nvs\n{ref_conf}"
    )

    print(
        f"worker {pid}: OK global_loss={loss:.6f} composed_loss={loss2:.6f}",
        flush=True,
    )


def main():
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--portfile", type=str, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        assert args.portfile, "--worker requires --portfile"
        worker(args.worker, args.nprocs, args.portfile)
        return

    def attempt() -> bool:
        portfile = os.path.join(
            tempfile.mkdtemp(prefix="ee_tpu_mh_"), "coordinator_port"
        )
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--nprocs", str(args.nprocs), "--worker", str(i),
                 "--portfile", portfile],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=REPO,
            )
            for i in range(args.nprocs)
        ]
        ok = True
        outs = []
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            tail = "\n".join(out.strip().splitlines()[-2:])
            print(f"--- worker {i} rc={p.returncode}\n{tail}")
            ok &= p.returncode == 0 and "OK global_loss=" in out
        if not ok:  # full tails, or the root cause hides above the RPC noise
            for i, out in enumerate(outs):
                tail = "\n".join(out.strip().splitlines()[-25:])
                print(f"=== worker {i} full tail ===\n{tail}")
        return ok

    # Single attempt: the port is now picked in-process by worker 0 right
    # before the coordinator binds it (no cross-process reserve/release
    # window), and the distributed timeouts are sized for the 1-core host —
    # the two former flake causes.  No retry loop to mask regressions.
    if not attempt():
        print("multihost_smoke: FAILED")
        sys.exit(1)
    print(f"multihost_smoke: OK ({args.nprocs} processes)")


if __name__ == "__main__":
    main()
