"""On-device masked gated inference: the whole early-exit policy as ONE
jitted XLA program.

The reference's sequential engine (/root/reference/ee_dnn_op_ne.py:51-108)
decides per image, per segment, on the host — every decision is a
device->host sync.  ee/sequential.py reduced that to one scalar fetch per
stage, but through a tunnel with ~30 ms RTT per call even that dominates.
This engine moves the *entire* gated forward — every segment, branch head,
gate (normalized entropy, ee_dnn_op_ne.py:80-87, or exit-vs-previous-exit
similarity, ee_dnn_op.py:84-94) and exit decision — inside a single jitted
program:

* exit decisions are a fixed-shape boolean ``alive`` vector (one lane per
  image) — no dynamic shapes ever reach XLA;
* segment ``k`` (and its branch head) runs under ``lax.cond(any(alive))``:
  XLA compiles a true conditional, so once every image in the micro-batch
  has exited, the remaining (most expensive) trunk segments genuinely do
  not execute — gated FLOPs savings become wall-clock, not bookkeeping;
* a ``lax.scan`` wrapper runs many micro-batches in one device call
  (one dispatch + one small result fetch for a whole dataset), so tunnel
  RTT amortizes to ~zero.

Row-level (per-image) savings inside a partially-alive micro-batch are
impossible at fixed shape — that granularity is the queue-compaction
serving engine's job (ee/serving.py).  Here the knob is the micro-batch
size: smaller B -> finer-grained skipping, larger B -> better MXU
utilization on the segments that do run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.ops.gating import SIM_GREATER, norm_entropy, similarity


def make_masked_gated_apply(
    model,
    variables,
    *,
    tau: float,
    n_classes: int = 21,
    skip: int = 0,
    pool: str = "none",
    pool_size: int = 1,
    pallas_head: bool = False,
    metric: str = "ent",
    sim_ignore=(),
    mesh=None,
):
    """Build ``fn(x) -> (labels, exit_idx)`` — the full gated early-exit
    forward as one program.  ``metric='ent'`` reproduces the entropy gate
    (ee_dnn_op_ne.py:51-108); a similarity metric name ('ssim' | 'mse' |
    'nmi' | 'vi' | 'h_xy' | 'h_yx') reproduces the exit-vs-previous-exit
    similarity gate (ee_dnn_op.py:84-94): the first evaluated branch only
    seeds the reference map, later branches fire when the similarity to the
    previous exit crosses tau (> tau for ssim/nmi, < tau otherwise).

    x: (N, H, W, C) preprocessed images (a micro-batch).
    labels: (N, H, W) int32 argmax map of each image's chosen exit.
    exit_idx: (N,) int32 — 1-based exit index (n+1 = final classifier),
    matching the reference's ``n`` output column.

    Images that pass branch ``k``'s gate (k >= skip) freeze their output;
    once *all* images have exited, later segments are skipped at run time
    via ``lax.cond``.

    ``mesh``: optional 'data' mesh — each device runs the whole gated
    program on its batch shard under ``shard_map`` (VERDICT r03 #2).  The
    ``lax.cond`` skip predicates become *per-device* (a device whose local
    rows have all exited skips its remaining segments even while another
    device keeps computing), which is strictly finer-grained skipping than
    single-device; per-row outputs are bit-identical because rows never
    interact.  Uneven batches fall back to the unsharded program.
    """
    body = _gated_forward_fn(
        model, variables, tau=tau, n_classes=n_classes, skip=skip,
        pool=pool, pool_size=pool_size, pallas_head=pallas_head,
        metric=metric, sim_ignore=sim_ignore,
    )
    if mesh is None:
        return jax.jit(body)
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.shape["data"])

    def fn(x):
        if x.shape[0] % n_dev:
            return body(x)
        return jax.shard_map(
            body, mesh=mesh, in_specs=P("data"),
            out_specs=(P("data"), P("data")), check_vma=False,
        )(x)

    return jax.jit(fn)


def _gated_forward_fn(model, variables, *, tau, n_classes, skip, pool,
                      pool_size, pallas_head=False, metric="ent",
                      sim_ignore=()):
    n = model.config.n_branches
    metric = metric.lower()
    entropy_gate = metric in ("ent", "max", "min")
    if metric in ("max", "min") and pool == "none":
        pool, metric = metric, "ent"
    use_pallas = pallas_head and pool == "none" and entropy_gate
    if use_pallas:
        from ee_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
            upsample_argmax,
            upsample_entropy_argmax,
        )
    sim_ignore = tuple(sim_ignore)

    def gated_forward(x):
        N, H, W = x.shape[0], x.shape[1], x.shape[2]
        out_hw = (H, W)
        alive = jnp.ones((N,), bool)
        labels = jnp.zeros((N, H, W), jnp.int32)
        exit_idx = jnp.full((N,), n + 1, jnp.int32)
        # similarity gate carry: previous exit's label map per row
        ref_map = jnp.zeros((N, H, W), jnp.int32)
        has_ref = jnp.zeros((N,), bool)

        def seg(k, feats):
            return model.apply(
                variables, feats, train=False,
                method=lambda m, f, train: m.run_segment(k, f, train=train),
            )

        def branch(k, feats):
            return model.apply(
                variables, feats, out_hw, train=False,
                method=lambda m, f, o, train: m.run_branch(k, f, o, train=train),
            )

        def classifier(feats):
            return model.apply(
                variables, feats, out_hw, train=False,
                method=lambda m, f, o, train: m.run_classifier(f, o, train=train),
            )

        feats = x
        for k in range(n):
            gated = k >= skip

            def stage(ops, k=k, gated=gated):
                f, ref = ops
                f2 = seg(k, f)
                if not gated:
                    return f2, jnp.zeros((N, H, W), jnp.int32), jnp.full(
                        (N,), jnp.inf, jnp.float32
                    )
                if use_pallas:
                    lr = model.apply(
                        variables, f2, train=False,
                        method=lambda m, ff, train: m.branches[k](ff, train=train),
                    )
                    lab, ent = upsample_entropy_argmax(lr, out_hw)
                    return f2, lab, ent
                logits = branch(k, f2)
                lab = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if entropy_gate:
                    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                    gate = jax.vmap(
                        lambda p: norm_entropy(p, n_classes, pool, pool_size)
                    )(probs)
                else:
                    gate = jax.vmap(
                        lambda r, c: similarity(r, c, metric, n_classes, sim_ignore)
                    )(ref, lab).astype(jnp.float32)
                return f2, lab, gate

            def dead(ops, k=k):
                shp = jax.eval_shape(lambda ff: seg(k, ff), ops[0])
                return (
                    jnp.zeros(shp.shape, shp.dtype),
                    jnp.zeros((N, H, W), jnp.int32),
                    jnp.full((N,), jnp.inf, jnp.float32),
                )

            feats, lab_k, gate_k = jax.lax.cond(
                jnp.any(alive), stage, dead, (feats, ref_map)
            )
            if gated:
                if entropy_gate:
                    fired = alive & (gate_k < tau)
                else:
                    cmp = gate_k > tau if metric in SIM_GREATER else gate_k < tau
                    # the first evaluated branch only seeds the reference map
                    # (ee_dnn_op.py:84-94: no previous exit -> no gate yet)
                    fired = alive & has_ref & cmp
                    upd = alive & ~fired
                    ref_map = jnp.where(upd[:, None, None], lab_k, ref_map)
                    has_ref = has_ref | upd
                labels = jnp.where(fired[:, None, None], lab_k, labels)
                exit_idx = jnp.where(fired, jnp.int32(k + 1), exit_idx)
                alive = alive & ~fired

        # final segment + classifier only for still-alive rows
        def last(f):
            f2 = seg(n, f)
            if use_pallas:
                lr = model.apply(
                    variables, f2, train=False,
                    method=lambda m, ff, train: m.classifier(ff, train=train),
                )
                return upsample_argmax(lr, out_hw)
            return jnp.argmax(classifier(f2), axis=-1).astype(jnp.int32)

        lab_last = jax.lax.cond(
            jnp.any(alive), last, lambda f: jnp.zeros((N, H, W), jnp.int32), feats
        )
        labels = jnp.where(alive[:, None, None], lab_last, labels)
        return labels, exit_idx

    return gated_forward


def make_masked_gated_scan(model, variables, mesh=None, **kw):
    """Build ``fn(xs) -> (labels, exit_idx)`` over stacked micro-batches.

    xs: (S, B, H, W, C) — S micro-batches of B images.  The gated program
    runs under ``lax.scan``, so the whole dataset is ONE device dispatch;
    per-micro-batch ``lax.cond`` skipping still applies inside each step.
    Returns (S, B, H, W) labels and (S, B) exit indices.

    ``mesh``: optional 'data' mesh — micro-batches shard along B (axis 1)
    under shard_map; the scan runs per device with per-device segment
    skipping (see :func:`make_masked_gated_apply`).
    """
    kw.setdefault("n_classes", 21)
    kw.setdefault("skip", 0)
    kw.setdefault("pool", "none")
    kw.setdefault("pool_size", 1)
    kw.setdefault("pallas_head", False)
    body = _gated_forward_fn(model, variables, **kw)

    def scan_all(xs):
        def step(carry, x):
            return carry, body(x)

        _, (labels, exits) = jax.lax.scan(step, 0, xs)
        return labels, exits

    if mesh is None:
        return jax.jit(scan_all)
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.shape["data"])

    def run(xs):
        if xs.shape[1] % n_dev:
            return scan_all(xs)
        return jax.shard_map(
            scan_all, mesh=mesh, in_specs=P(None, "data"),
            out_specs=(P(None, "data"), P(None, "data")), check_vma=False,
        )(xs)

    return jax.jit(run)


def gated_flops_per_image(model, exit_counts, skip: int = 0, img_dim=None,
                          exclude_first_branch: bool = False):
    """Average realized FLOPs/image given per-exit counts (1-based index ->
    count), priced by the analytic table — the reference's ``avg_flops``
    CSV column (ee_dnn_op_ne.py:194-206), but for the masked engine the
    numbers correspond to actual skipped compute at micro-batch granularity.

    ``exclude_first_branch`` drops the first *evaluated* branch head's cost
    (branch ``skip``) — the reference CSV's ``_2`` columns
    (ee_dnn_op.py:106-117).
    """
    table = model.flops_table(img_dim)
    seg, br = table["segments"], table["branches"]
    n = model.config.n_branches
    total = 0.0
    count = 0
    for e, c in exit_counts.items():
        e = int(e)
        # trunk through segment e-1 (exit e means branch e fired after
        # segment e; final exit n+1 pays every segment + classifier)
        n_segs = min(e, n + 1)
        cost = sum(seg[:n_segs])
        # every gated branch head up to the firing one runs
        first = skip + 1 if exclude_first_branch else skip
        for k in range(first, min(e, n)):
            cost += br[k]
        if e == n + 1:
            cost += br[-1]
        total += cost * c
        count += c
    return total / max(count, 1)
