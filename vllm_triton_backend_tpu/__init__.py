"""vllm_triton_backend_tpu — a TPU-native paged-attention LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capability stack of
``foundation-model-stack/vllm-triton-backend`` (the reference implements a
Triton attention backend plugged into vLLM; see SURVEY.md).  This package is a
*standalone* engine: model execution, paged KV-cache management, continuous
batching, sampling, quantization, autotuning, and multi-chip sharding are all
first-class here rather than delegated to a host framework.

Layer map (TPU edition of SURVEY.md §1):

  L6  benchmarks/           serving + latency sweep drivers
  L5  runtime/              engine: scheduler, block allocator, sampler, server
  L4  ops/attention.py      unified attention dispatcher (the "backend")
  L3  ops/pallas/*          kernel wrappers (grid/launch logic)
  L2  ops/pallas/*          Pallas TPU kernels (Mosaic-compiled)
  L1  autotune/dejavu.py    persistent block-shape config cache
  L0  jaxlib/XLA/Mosaic     provided by the environment
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (set VTB_COMPILE_CACHE=0 to skip).

    First Mosaic/XLA compiles dominate cold-start latency; the on-disk
    cache makes every subsequent process reuse them — the same
    persistence story as the autotuner DB (SURVEY.md §5.4)."""
    if _os.environ.get("VTB_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        path = _os.environ.get(
            "VTB_COMPILE_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "vtb_jax_cache"
            ),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from vllm_triton_backend_tpu.config import CacheConfig, EngineConfig, ModelConfig

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "__version__",
]
