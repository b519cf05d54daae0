"""ee_semantic_segmentation_tpu — TPU-native early-exit semantic segmentation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch codebase ``MateusGilbert/ee_semantic_segmentation``
(branchy DeepLabV3 on Pascal VOC: multi-exit training, entropy / similarity
gated early-exit inference, per-exit FLOPs + mIoU accounting).

Canonical array layout is channels-last (TPU-native):

* single-exit logits:  ``(N, H, W, C)``
* multi-exit logits:   ``(E, N, H, W, C)`` (exit axis first, like the
  reference's stacked ``(n_exits, N, C, H, W)`` output,
  /root/reference/from_deepv3_new.py:143-155)
* integer label maps:  ``(N, H, W)`` with the void class mapped to
  ``num_classes`` (VOC: 255 -> 21, /root/reference/get_seg_datasets.py:85)

Subpackages
-----------
ops       pure-JAX losses, metrics and gating numerics
models    Flax modules: dilated ResNet / MobileNetV3 backbones, ASPP heads,
          and the analytic-FLOPs branchy segmenter
data      input pipeline (VOC reader, transforms, host-sharded loader)
train     training engine (SGD param groups, schedulers, early stopping,
          Orbax checkpointing)
parallel  mesh / sharding / pjit train + eval steps
ee        early-exit inference engines (batched simulators + sequential)
cli       mirrored command-line entry points
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt out: EE_TPU_NO_COMPILE_CACHE=1).

    First compiles in this environment run tens of seconds; caching them on
    disk makes repeated CLI / test invocations start hot."""
    if _os.environ.get("EE_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get("EE_TPU_COMPILE_CACHE", "/tmp/jax_compile_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
