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

from vllm_triton_backend_tpu.config import CacheConfig, EngineConfig, ModelConfig

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "__version__",
]
