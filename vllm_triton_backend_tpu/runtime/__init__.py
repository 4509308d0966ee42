"""Runtime — the engine layer the reference delegates to vLLM (SURVEY.md §1
L5): sampler, block allocator, continuous-batching scheduler, engine, server.
Here they are first-class TPU-native components.
"""

from vllm_triton_backend_tpu.runtime.sampler import SamplingParams, sample

__all__ = ["SamplingParams", "sample"]
