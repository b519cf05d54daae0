"""Early-exit inference engines and evaluators.

* ``batch_eval`` — full-forward policy *simulators*: per-exit mIoU
  (eval_mIoU equivalent), entropy-gated (eval_br_ent) and similarity-gated
  (eval_br_sim / eval_br_images) evaluation with exit histograms.  Gating is
  computed vectorized on device; only per-image exit choices stream back.
* ``sequential`` — the true segment-at-a-time engine (ee_dnn_op /
  ee_dnn_op_ne equivalents) that actually *stops* computing at the chosen
  exit and prices each exit with the analytic FLOPs table.
* ``masked`` — the whole gated policy as ONE jitted program: exits tracked
  by a fixed-shape alive mask, segments skipped at run time via lax.cond,
  many micro-batches per dispatch via lax.scan.
* ``serving`` — host-side queue/compaction pipeline for streaming serving
  (row-granular savings across micro-batches).
* ``images`` — palette-PNG qualitative dumps per exit (eval_image).
"""

from ee_semantic_segmentation_tpu.ee.batch_eval import (
    mIoU_evaluator,
    br_evaluator_entropy,
    br_evaluator_similarity,
)
from ee_semantic_segmentation_tpu.ee.sequential import EarlyExitRunner
from ee_semantic_segmentation_tpu.ee.serving import BatchedEarlyExitServer
from ee_semantic_segmentation_tpu.ee.masked import (
    make_masked_gated_apply,
    make_masked_gated_scan,
    gated_flops_per_image,
)
from ee_semantic_segmentation_tpu.ee.generic_eval import (
    Accumulator,
    eval_results,
    eval_branches,
    repeat_tensor,
)
