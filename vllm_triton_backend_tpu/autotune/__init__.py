"""Autotuning layer — persistent kernel-config cache ("dejavu for Pallas").

TPU re-creation of the reference's triton-dejavu layer (SURVEY.md §2.3):
zero-overhead autotuning by persisting winning kernel configs in a JSON DB
keyed by environment + kernel + shape-bucket, with informed fallbacks when
tuning is disabled.
"""

from vllm_triton_backend_tpu.autotune.dejavu import (
    ConfigSpace,
    autotune,
    global_cache_lock,
)

__all__ = ["ConfigSpace", "autotune", "global_cache_lock"]
