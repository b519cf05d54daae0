"""Batched early-exit serving: static-shape stage pipeline with queues.

The reference's sequential engine (ee_dnn_op*.py) processes ONE image at a
time, paying per-image Python+profiling overhead; its batched evaluators pay
the FULL forward for every image (SURVEY.md §3.4).  Neither turns early-exit
FLOPs savings into throughput.  This engine does, TPU-style:

* trunk segment ``k`` (+ its branch head + entropy gate) is one jitted
  program at a **fixed** micro-batch size B — XLA sees only static shapes;
* each stage has a queue; an image that fails its gate forwards its
  *features* to the next stage's queue; an image that passes emits its label
  map and leaves the pipeline;
* stages run whenever B inputs are queued (or at flush, padded), so device
  work per image approaches the true gated cost: images that exit early
  never occupy later (more expensive) stages;
* **double-buffered scheduling** (round 3): stage execution is split into
  an async *dispatch* phase and a blocking *resolve* phase.  A whole wave
  of ready micro-batches is dispatched before the first gate vector is
  fetched, so stage k+1's input assembly (and every other runnable stage)
  overlaps stage k's device compute — on a remote tunnel the ~30 ms
  round-trip of each gate fetch is paid under the compute of the other
  in-flight stages instead of serializing the pipeline.  Exited images'
  label maps are NOT fetched on the critical path either; they stay on
  device until ``flush()``/``results()`` materializes them.

Bookkeeping uses the analytic FLOPs table, giving the same avg-FLOPs/image
accounting as the reference's ee_dnn_op CSVs — but as *realized* compute.
Continuous-batching stats (per-stage runs, padded-slot fraction, wave
sizes) are exposed via ``stats()``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ee_semantic_segmentation_tpu.ops.gating import norm_entropy


@dataclasses.dataclass
class _Item:
    uid: int
    data: jnp.ndarray  # input image or intermediate features (no batch dim)


class BatchedEarlyExitServer:
    """Entropy-gated streaming server over a branchy model.

    Usage::

        server = BatchedEarlyExitServer(model, params, batch_stats,
                                        tau=0.3, batch_size=8)
        server.submit(images)          # (N, H, W, C), any N
        results = server.flush()       # uid -> {label_map, n (exit index)}
    """

    def __init__(self, model, params, batch_stats, *, tau: float,
                 batch_size: int = 8, n_classes: int = 21, skip: int = 0,
                 img_hw: tuple[int, int] | None = None):
        self.model = model
        self.vars = {"params": params, "batch_stats": batch_stats}
        self.tau = tau
        self.B = batch_size
        self.n_classes = n_classes
        self.skip = skip
        self.n = model.config.n_branches
        hw = img_hw or model.config.img_hw
        self.out_hw = hw

        table = model.flops_table(hw)
        self._seg_flops = table["segments"]
        self._br_flops = table["branches"]

        self._queues: list[list[_Item]] = [[] for _ in range(self.n + 1)]
        self._results: dict[int, dict] = {}
        # exited maps deferred on device: list of (uids, exit_idx, maps_dev)
        self._pending_maps: list[tuple[list[int], int, jnp.ndarray]] = []
        self._next_uid = 0
        self.stage_runs = np.zeros(self.n + 1, np.int64)
        self.total_flops = 0.0
        self.padded_slots = 0
        self.filled_slots = 0
        self.wave_sizes: list[int] = []

        mdl, var = model, self.vars

        def make_stage(k: int):
            gated = k < self.n and k >= skip

            @jax.jit
            def run(x):
                feats = mdl.apply(
                    var, x, train=False,
                    method=lambda m, x, train: m.run_segment(k, x, train=train),
                )
                if gated:
                    logits = mdl.apply(
                        var, feats, self.out_hw, train=False,
                        method=lambda m, x, o, train: m.run_branch(k, x, o, train=train),
                    )
                    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                    ent = jax.vmap(lambda p: norm_entropy(p, n_classes))(probs)
                    labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return feats, labels, ent
                if k == self.n:
                    logits = mdl.apply(
                        var, feats, self.out_hw, train=False,
                        method=lambda m, x, o, train: m.run_classifier(x, o, train=train),
                    )
                    labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return feats, labels, jnp.zeros((x.shape[0],), jnp.float32)
                # ungated branch position (skipped): trunk only
                dummy = jnp.zeros((x.shape[0],) + self.out_hw, jnp.int32)
                return feats, dummy, jnp.full((x.shape[0],), jnp.inf, jnp.float32)

            return run

        self._stages = [make_stage(k) for k in range(self.n + 1)]

    # ------------------------------------------------------------------
    def submit(self, images) -> list[int]:
        """Enqueue (N, H, W, C) images; returns their uids.  Stages run
        opportunistically whenever a full micro-batch is available."""
        uids = []
        images = jnp.asarray(images)
        for i in range(images.shape[0]):
            uid = self._next_uid
            self._next_uid += 1
            self._queues[0].append(_Item(uid, images[i]))
            uids.append(uid)
        self._drain(full_only=True)
        return uids

    def _dispatch_stage(self, k: int, items: list[_Item]):
        """Async phase: launch stage k on a micro-batch.  Returns a pending
        record; nothing here blocks on the device."""
        B = self.B
        pad = B - len(items)
        xs = [it.data for it in items]
        if pad:
            xs = xs + [xs[-1]] * pad
        x = jnp.stack(xs)
        feats, labels, ent = self._stages[k](x)
        self.stage_runs[k] += 1
        self.padded_slots += pad
        self.filled_slots += len(items)
        # realized compute: the whole micro-batch pays the stage cost
        stage_cost = self._seg_flops[k] if k < self.n else self._seg_flops[-1]
        head_cost = self._br_flops[k] if (k < self.n and k >= self.skip) else (
            self._br_flops[-1] if k == self.n else 0.0
        )
        self.total_flops += B * (stage_cost + head_cost)
        return (k, items, feats, labels, ent)

    def _resolve(self, pending):
        """Blocking phase: fetch the gate vector (one small transfer), route
        survivors' features (device-side gather) and park exited images'
        label maps ON DEVICE for a deferred fetch."""
        k, items, feats, labels, ent = pending
        ent_np = np.asarray(ent[: len(items)])
        if k == self.n:
            exited = list(range(len(items)))
        elif k >= self.skip:
            exited = [j for j in range(len(items)) if ent_np[j] < self.tau]
        else:
            exited = []
        survivors = [j for j in range(len(items)) if j not in set(exited)]

        if exited:
            maps = jnp.take(labels, jnp.asarray(exited), axis=0)
            uids = [items[j].uid for j in exited]
            self._pending_maps.append(
                (uids, (self.n + 1) if k == self.n else (k + 1), maps)
            )
        if survivors:
            surv = jnp.take(feats, jnp.asarray(survivors), axis=0)
            for row, j in enumerate(survivors):
                self._queues[k + 1].append(_Item(items[j].uid, surv[row]))

    def _drain(self, full_only: bool = True):
        progressed = True
        while progressed:
            progressed = False
            # dispatch EVERY runnable micro-batch before resolving any gate:
            # each resolve's blocking fetch then overlaps the other stages'
            # in-flight compute (the double buffer)
            wave = []
            for k in range(self.n + 1):
                q = self._queues[k]
                while len(q) >= self.B:
                    wave.append(
                        self._dispatch_stage(k, [q.pop(0) for _ in range(self.B)])
                    )
            if not wave and not full_only:
                for k in range(self.n + 1):
                    q = self._queues[k]
                    if q:
                        wave.append(
                            self._dispatch_stage(k, [q.pop(0) for _ in range(len(q))])
                        )
            if wave:
                self.wave_sizes.append(len(wave))
            for p in wave:
                self._resolve(p)
                progressed = True

    def _materialize(self):
        for uids, n_exit, maps in self._pending_maps:
            maps_np = np.asarray(maps)
            for row, uid in enumerate(uids):
                self._results[uid] = {"label_map": maps_np[row], "n": n_exit}
        self._pending_maps = []

    def flush(self) -> dict[int, dict]:
        """Run all remaining partial batches; returns uid -> result."""
        while any(self._queues):
            self._drain(full_only=False)
        self._materialize()
        out, self._results = self._results, {}
        return out

    def stats(self) -> dict:
        """Continuous-batching stats: per-stage run counts, slot occupancy,
        dispatch-wave sizes (>1 = overlapped stages)."""
        total_slots = self.filled_slots + self.padded_slots
        return {
            "stage_runs": self.stage_runs.tolist(),
            "occupancy": self.filled_slots / max(total_slots, 1),
            "padded_slots": self.padded_slots,
            "waves": len(self.wave_sizes),
            "mean_wave": float(np.mean(self.wave_sizes)) if self.wave_sizes else 0.0,
            "avg_flops_per_image": self.avg_flops_per_image,
        }

    @property
    def avg_flops_per_image(self) -> float:
        done = self._next_uid
        return self.total_flops / max(done, 1)
