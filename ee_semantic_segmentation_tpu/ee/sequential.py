"""Sequential early-exit engine: segment-at-a-time inference with per-exit
FLOPs pricing.

Re-designs /root/reference/ee_dnn_op.py:40-118 and ee_dnn_op_ne.py:40-108:
run trunk segment ``i``, compute exit ``i``'s label map, evaluate the gate
(exit-vs-previous-exit similarity, or normalized entropy of the softmax) and
stop at the first firing exit.  Differences from the reference:

* FLOPs come from the analytic table (model.flops_table) computed ONCE —
  the reference re-ran pthflops probe forwards per segment *per image*
  (ee_dnn_op.py:66-105), dominating its own measurement;
* every stage (segment, branch head + upsample + argmax, gate metric) is a
  pre-jitted XLA program; the only host sync per stage is the scalar gate
  value — the reference shipped whole label maps to CPU for scipy/skimage
  per image (ee_dnn_op_ne.py:80);
* the ``less_than=False`` path works (the reference had a NameError there,
  SURVEY.md bug #2);
* like the reference, the final head is always computed so the ``'last'``
  output and its FLOPs are reported alongside the gated exit
  (ee_dnn_op.py:99-117).

The gated-stop control flow is host-side Python by design: this engine
models *single-image edge serving* where later segments truly never run.
For batched policy evaluation at full throughput use ee/batch_eval.py.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ee_semantic_segmentation_tpu.ops.gating import norm_entropy, similarity


class EarlyExitRunner:
    """Callable: (H, W, C) image -> dict with exit map, FLOPs, exit index.

    Args:
      model/params/batch_stats: the branchy model and its variables.
      metric: 'ssim' | 'mse' | 'nmi' | 'vi' | 'h_xy' | 'h_yx' for the
        similarity gate (ee_dnn_op.py), or 'ent' | 'max' | 'min' for the
        entropy gate (ee_dnn_op_ne.py).
      threshold: gate threshold tau.
      less_than: similarity gate fires when value < tau (True, default,
        matching eval metrics where lower = more similar) or > tau.
      ignore: branch indices to skip entirely (ee_dnn_op.py '-I' flag).
      n_classes: class count (entropy base / similarity histogram size).
      pool_size: block-reduce size for 'max'/'min' entropy pooling.
      sim_ignore: labels ignored by VI/seg_comp gates.
    """

    def __init__(
        self,
        model,
        params,
        batch_stats,
        *,
        metric: str = "ent",
        threshold: float = 0.5,
        less_than: bool = True,
        ignore: Sequence[int] = (),
        n_classes: int = 21,
        pool_size: int = 1,
        sim_ignore: Sequence[int] = (),
        img_dim: int | tuple[int, int] | None = None,
    ):
        self.model = model
        self.vars = {"params": params, "batch_stats": batch_stats}
        self.metric = metric.lower()
        self.entropy_gate = self.metric in ("ent", "max", "min")
        self.threshold = threshold
        self.less_than = less_than
        self.ignore = set(int(i) for i in ignore)
        self.n_classes = n_classes
        self.pool_size = pool_size
        self.sim_ignore = tuple(sim_ignore)
        self.n = model.config.n_branches
        non_ignored = [i for i in range(self.n) if i not in self.ignore]
        self.last_br = max(non_ignored) if non_ignored else -1

        table = model.flops_table(img_dim)
        self.segment_flops = table["segments"]
        self.branch_flops_table = table["branches"]

        # pre-jitted stages
        def seg(idx):
            @jax.jit
            def run(x):
                return model.apply(
                    self.vars, x, train=False,
                    method=lambda m, x, train: m.run_segment(idx, x, train=train),
                )
            return run

        self._segments = [seg(i) for i in range(self.n + 1)]
        self._branch_fns = {}

        @jax.jit
        def argmax_map(logits):
            return jnp.argmax(logits, axis=-1)

        self._argmax = argmax_map

        if self.entropy_gate:
            pool = {"ent": "none", "max": "max", "min": "min"}[self.metric]

            @jax.jit
            def gate_value(logits):  # (1, H, W, C)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return norm_entropy(probs[0], n_classes, pool, pool_size)

            self._gate_entropy = gate_value
        else:

            @jax.jit
            def sim_value(ref_map, cur_map):  # (H, W) int maps
                return similarity(ref_map, cur_map, self.metric, n_classes, self.sim_ignore)

            self._gate_sim = sim_value

    # ------------------------------------------------------------------
    def _branch_fn(self, idx, out_hw):
        key = (idx, out_hw)
        if key not in self._branch_fns:
            model, vars_ = self.model, self.vars

            @jax.jit
            def run(x):
                return model.apply(
                    vars_, x, out_hw, train=False,
                    method=lambda m, x, o, train: m.run_branch(idx, x, o, train=train),
                )

            self._branch_fns[key] = run
        return self._branch_fns[key]

    def _classifier(self, out_hw):
        key = ("cls", out_hw)
        if key not in self._branch_fns:
            model, vars_ = self.model, self.vars

            @jax.jit
            def run(x):
                return model.apply(
                    vars_, x, out_hw, train=False,
                    method=lambda m, x, o, train: m.run_classifier(x, o, train=train),
                )

            self._branch_fns[key] = run
        return self._branch_fns[key]

    def _fires(self, value: float) -> bool:
        return value < self.threshold if self.less_than else value > self.threshold

    def __call__(self, image: np.ndarray) -> dict:
        """image: (H, W, C) or (1, H, W, C) preprocessed input."""
        x = jnp.asarray(image)
        if x.ndim == 3:
            x = x[None]
        out_hw = (x.shape[1], x.shape[2])

        output: dict = {}
        main_flops: list[float] = []
        branch_flops: list[float] = []
        y_ref = None
        left = False

        for i in range(self.n):
            main_flops.append(self.segment_flops[i])
            x = self._segments[i](x)

            if i not in self.ignore and not left:
                logits = self._branch_fn(i, out_hw)(x)
                br_map = self._argmax(logits)  # (1, H, W)
                branch_flops.append(self.branch_flops_table[i])

                if self.entropy_gate:
                    fired = self._fires(float(self._gate_entropy(logits)))
                else:
                    fired = y_ref is not None and self._fires(
                        float(self._gate_sim(y_ref[0], br_map[0]))
                    )
                if fired:
                    output["exit"] = np.asarray(br_map[0])
                    output["exit_flops"] = sum(branch_flops) + sum(main_flops)
                    output["exit_flops_2"] = sum(branch_flops[1:]) + sum(main_flops)
                    output["edge_flops"] = output["exit_flops"]
                    output["edge_flops_2"] = output["exit_flops_2"]
                    output["n"] = i + 1
                    left = True
                else:
                    y_ref = br_map
            if not left and i == self.last_br:
                output["edge_flops"] = sum(branch_flops) + sum(main_flops)
                output["edge_flops_2"] = sum(branch_flops[1:]) + sum(main_flops)

        # final segment + classifier: always computed for 'last'
        main_flops.append(self.segment_flops[-1])
        x = self._segments[self.n](x)
        main_flops.append(self.branch_flops_table[-1])
        y = self._classifier(out_hw)(x)
        y_map = np.asarray(self._argmax(y)[0])
        output["last"] = y_map
        output["last_flops"] = sum(branch_flops) + sum(main_flops)
        output["last_flops_2"] = sum(branch_flops[1:]) + sum(main_flops)
        if not left:
            output["exit"] = y_map
            output["exit_flops"] = output["last_flops"]
            output["exit_flops_2"] = output["last_flops_2"]
            output.setdefault("edge_flops", output["last_flops"])
            output.setdefault("edge_flops_2", output["last_flops_2"])
            output["n"] = self.n + 1
        return output
